package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, BenchQueries, ExtQueries, ParityQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (and the §7.5 extensions) gets a named
  * entry in [[queries]]; everything SQL-expressible gets DuckDB oracle SQL
  * in [[oracleSql]] with IDENTICAL output column names.
  *
  * Cross-engine conventions (why the SQL looks the way it does):
  *  - `events.ts` is parquet TIMESTAMP(NANOS): Spark (nanosAsLong) sees
  *    epoch-nanos Long, DuckDB sees a timestamp. All time math happens on
  *    epoch MICROSECONDS: Spark `ts div 1000` ≡ DuckDB `epoch_us(ts)`.
  *  - double aggregates are rounded (4 dp) or routed through exact
  *    decimal sums (`CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`) so
  *    summation-order float drift can't flip the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * F1: 1-minute tumbling avg/min/max/count — the reference's core
    * computation (sensor_aggregation.py:83-98) over the events mapping
    * (user_id↦machine_id, event_type↦sensor_type; FIXTURES.md §B). */
  def entry(spark: SparkSession): DataFrame =
    queries("tumbling_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5
    * extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ BenchQueries.queries ++ ExtQueries.queries ++
      AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ BenchQueries.oracleSql ++ ExtQueries.oracleSql ++
      AnalyticsQueries.oracleSql
}
