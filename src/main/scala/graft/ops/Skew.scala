package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §7.4 "salted group
  * keys for skewed machines"; the 100 TB concern the reference's
  * parallelism-1 pipeline never meets).
  *
  * Two-stage salted aggregation: stage 1 groups by (key, salt) so a hot
  * key's rows spread over `saltBuckets` reducers; stage 2 merges the
  * partials per key. Correct for algebraic aggregates (sum/count/min/
  * max — avg is derived as sum/count at the end). AQE's skew-join
  * splitting handles *join* skew at runtime; salting is the analog for
  * aggregation skew, where a single reducer would otherwise own the hot
  * key's entire partition.
  */
object Skew {

  /** Salted sum/count/min/max + derived avg over `value`, grouped by
    * `keys`. Output columns match Windows.standardAggs naming. */
  def saltedStandardAggs(
      df: DataFrame,
      keys: Seq[Column],
      value: Column,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(
        sum(value).as("__sum"),
        count(lit(1)).as("__cnt"),
        min(value).as("__min"),
        max(value).as("__max"))
    val keyNames = partial.columns.dropRight(5).map(col).toSeq // keys only
    partial
      .groupBy(keyNames: _*)
      .agg(
        round(sum(col("__sum")) / sum(col("__cnt")), 4).as("avg_value"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"),
        sum(col("__cnt")).as("count_readings"))
  }

  /** Salted equi-join for a skewed FACT side: fact rows get a random
    * salt in [0, saltBuckets); the (small, hot-key-bearing) build side
    * is replicated once per salt value, so a hot key's probe rows
    * spread across `saltBuckets` reducers instead of landing on one.
    * Identical result multiset to `facts.join(build, key)` — each fact
    * row matches exactly the one replica carrying its salt.
    *
    * This is the MANUAL form for engines/plans where AQE's runtime
    * skew-join splitting can't kick in (e.g. a shuffle consumed by a
    * non-join operator, or a deliberately disabled AQE); with AQE on,
    * prefer the built-in splitting — it pays the replication only for
    * the partitions that are actually skewed.
    *
    * @param facts big, skewed side
    * @param build small side (replicated saltBuckets ×)
    */
  def saltedJoin(
      facts: DataFrame,
      build: DataFrame,
      key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets))
        .cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFacts.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
