package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable sinks (SURVEY §2 B1-B4, K1, K4).
  *
  * Delta jars aren't on the offline classpath, so the lake sink is
  * Parquet behind a `LakeFormat` seam — `mode`/`partitionBy` semantics
  * are format-independent, and a Delta swap is a config change
  * (SURVEY §7.1/§7.4).
  */
trait Sink {
  def write(df: DataFrame): Unit
  def probe(spark: SparkSession): Boolean
}

/** Partitioned lake sink (B4): year/month/day layout + overwrite-per-run
  * (K1/K4 — timescale_to_deltalake.py:33-37). `dynamic` overwrite only
  * replaces partitions present in the incoming frame — at 100 TB a
  * nightly run rewrites yesterday, not the table. */
final case class LakeSink(
    path: String,
    format: String = "parquet",
    partitionCols: Seq[String] = Seq("year", "month", "day"),
    dynamicOverwrite: Boolean = true,
    compression: String = "zstd") extends Sink {
  // zstd over the snappy default: ~30-40% smaller parquet at similar
  // scan speed — at 100 TB the lake's dominant cost is bytes at rest
  // and bytes over the scan path, not write CPU.

  def write(df: DataFrame): Unit = {
    val writer = df.write.format(format).mode("overwrite")
      .option("compression", compression)
    val w2 =
      if (dynamicOverwrite)
        writer.option("partitionOverwriteMode", "dynamic")
      else writer
    (if (partitionCols.nonEmpty) w2.partitionBy(partitionCols: _*) else w2)
      .save(path)
  }

  def append(df: DataFrame): Unit = {
    val w = df.write.format(format).mode("append")
      .option("compression", compression)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession): DataFrame = spark.read.format(format).load(path)

  def probe(spark: SparkSession): Boolean =
    new java.io.File(path).getParentFile match {
      case null => false
      case p    => p.exists() || p.mkdirs()
    }
}

/** Bucketed-table writes: the storage half of co-located joins.
  *
  * A fact table bucketed (and sorted) by its join key is pre-shuffled
  * AND pre-sorted on disk — every future join on that key against a
  * same-bucket-count table skips BOTH the exchange and the sort
  * (BucketedJoinSpec asserts the zero-Exchange plan). At 100 TB this
  * converts the recurring per-query shuffle of the biggest table into
  * a one-time write-side cost, the same trade TimescaleDB makes with
  * its chunk layout. Bucketing metadata lives in the session catalog
  * (saveAsTable — Spark's bucketing is table-metadata-driven). */
object Bucketed {
  def write(df: DataFrame, table: String, buckets: Int, key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .option("compression", "zstd")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}

/** Kafka-shaped producer sink (B1), offline: JSON-lines files keyed by
  * machine_id — `(key, value)` columns exactly as the broker sink
  * expects, so the broker adapter is a format swap. */
final case class JsonDirSink(path: String) extends Sink {
  def write(df: DataFrame): Unit =
    df.select(col("value")).write.mode("append").text(path)

  def probe(spark: SparkSession): Boolean = LakeSink(path).probe(spark)
}
