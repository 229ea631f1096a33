package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactSpec extends SparkSpec with graft.LowStatePartitions {

  test("binPack collapses a many-small-files table, preserving the data") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    events.repartition(32).write.parquet(dir)

    val stats = Compact.binPack(spark, dir, targetBytes = 1L << 30)
    assert(stats.dirsCompacted == 1)
    assert(stats.filesBefore == 32 && stats.filesAfter == 1)

    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    assert(back.agg(sum("event_id")).head.getLong(0) ==
      events.agg(sum("event_id")).head.getLong(0))
  }

  test("binPack is idempotent and per-partition under a partitioned layout") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    graft.Tables.events(spark, sf)
      .withColumn("bucket", (col("user_id") % 3).cast("int"))
      .repartition(8)
      .write.partitionBy("bucket").parquet(dir)

    val first = Compact.binPack(spark, dir, targetBytes = 1L << 30)
    assert(first.dirsCompacted == 3, s"one rewrite per partition leaf: $first")
    assert(first.filesAfter == 3)

    // Partition values (from the path) survive the per-leaf rewrite.
    val back = spark.read.parquet(dir)
    assert(back.select("bucket").distinct().count() == 3)
    assert(back.count() == graft.Tables.events(spark, sf).count())

    val second = Compact.binPack(spark, dir, targetBytes = 1L << 30)
    assert(second.dirsCompacted == 0 && second.filesAfter == 3,
      s"second pass must be a no-op: $second")
  }

  test("binPack respects targetBytes (splits into multiple bins when large)") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    graft.Tables.events(spark, sf).repartition(16).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    // Target ~ a third of the table: expect ceil(bytes/target) = 3 bins.
    val stats = Compact.binPack(spark, dir, targetBytes = bytes / 3 + 1)
    assert(stats.filesAfter == 3, s"expected 3 bins: $stats")
    assert(spark.read.parquet(dir).count() ==
      graft.Tables.events(spark, sf).count())
  }
}
