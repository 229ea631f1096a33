package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Dimension-enrichment join (SURVEY §2 E1).
  *
  * The reference's schema implies machine metadata enrichment
  * (`init-db.sql:9,12` has machine_type/location) that its Flink insert
  * never realizes (`sensor_aggregation.py:76-80` → silent NULLs). Here
  * it's the canonical broadcast hash join: dims are tiny (4 machines; at
  * 100 TB still ≤ millions of rows → broadcast), facts never shuffle.
  */
object Enrich {

  /** facts ⋈ small dim, broadcast, left-outer (unmatched facts keep NULL
    * dim columns — the reference's observed behavior). */
  def enrich(facts: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    facts.join(broadcast(dim), keys, "left")
}
