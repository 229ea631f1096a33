package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention-policy semantics (SURVEY §2 K3).
  *
  * Reference: TimescaleDB `add_retention_policy(..., INTERVAL '90 days')`
  * (`infrastructure setup/init-db.sql:43-44`) — automatic chunk drop past
  * the horizon. Spark-native analog: a partition-pruned predicate for
  * reads, and whole-partition-directory drops for storage (year/month/day
  * layout → deleting a day is a metadata op, no rewrite).
  */
object Retention {

  /** Rows within `horizonUs` of the dataset's own max timestamp
    * (epoch-micros long column). The max is a 1-row broadcast — no
    * second full scan shuffle. */
  def retain(df: DataFrame, tsUs: Column, horizonUs: Long): DataFrame = {
    val cutoff = df.agg((max(tsUs) - horizonUs).as("cutoff"))
    df.crossJoin(broadcast(cutoff)).filter(tsUs >= col("cutoff")).drop("cutoff")
  }
}
