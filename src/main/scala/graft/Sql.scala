package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point: registers the corpus tables as temp views so every
  * engine capability is reachable through `spark.sql(...)` — the
  * interface the reference's users actually write (Flink SQL /
  * TimescaleDB SQL). DataFrame and SQL plans meet in the same Catalyst
  * pipeline, so this is registration, not a second engine.
  */
object Sql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all corpus tables for `sfDir` as temp views. `events` goes
    * through [[Tables.events]] so `ts` is epoch-nanos Long regardless of
    * the file's timestamp precision (see the normalization note there). */
  def register(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { t =>
      val df =
        if (t == "events") Tables.events(spark, sfDir)
        else Tables.read(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  /** Run a SQL query against the registered views. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}
