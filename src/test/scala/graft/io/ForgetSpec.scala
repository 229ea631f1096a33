package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Forget.forgetKeys: targeted erasure rewrites ONLY the partitions
  * holding the keys; everything else keeps its exact files. */
class ForgetSpec extends SparkSpec with graft.LowStatePartitions {
  import spark.implicits._

  private def buildLake(): (String, Long) = {
    val dir = Files.createTempDirectory("forget").toString + "/t"
    // users 0..29 spread across 3 day-partitions; user u appears only
    // in partition u % 3.
    val rows = for (u <- 0L until 30L; i <- 0 until 4)
      yield (u, (u % 3).toInt, u * 100 + i)
    rows.toDF("user_id", "day", "v")
      .repartition(4)
      .write.partitionBy("day").parquet(dir)
    (dir, rows.size.toLong)
  }

  private def leafFiles(dir: String, day: Int): Set[String] = {
    val leaf = new Path(s"$dir/day=$day")
    val fs = leaf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(leaf).filter(_.isFile).map(_.getPath.getName).toSet
  }

  test("forgetKeys erases the keys, rewrites only their partitions") {
    val (dir, total) = buildLake()
    val untouchedBefore = leafFiles(dir, 2)

    // users 3 and 6 both live in day=0 only.
    val stats = Forget.forgetKeys(spark, dir, "user_id", Seq(3L, 6L), Seq("day"))
    assert(stats === Forget.Stats(partitionsRewritten = 1, rowsRemoved = 8))

    val back = spark.read.parquet(dir)
    assert(back.count() === total - 8)
    assert(back.filter(col("user_id").isin(3L, 6L)).count() === 0)
    // no collateral loss: every other user keeps all 4 rows
    assert(back.groupBy(col("user_id")).count()
      .filter(col("count") =!= 4).count() === 0)
    // untouched partitions keep their exact files
    assert(leafFiles(dir, 2) === untouchedBefore)
    // rewritten leaf carries the forget-swap file names
    assert(leafFiles(dir, 0).forall(_.startsWith("part-forget-")))
  }

  test("forgetKeys spanning partitions rewrites each; second run is a no-op") {
    val (dir, total) = buildLake()
    val stats = Forget.forgetKeys(spark, dir, "user_id", Seq(4L, 5L), Seq("day"))
    assert(stats === Forget.Stats(partitionsRewritten = 2, rowsRemoved = 8))
    assert(spark.read.parquet(dir).count() === total - 8)

    val again = Forget.forgetKeys(spark, dir, "user_id", Seq(4L, 5L), Seq("day"))
    assert(again === Forget.Stats(0, 0L))
  }

  test("null-key rows survive the rewrite (anti-join null semantics)") {
    val dir = Files.createTempDirectory("forgetnull").toString + "/t"
    Seq[(Option[Long], Int, Long)](
      (Some(1L), 0, 10L), (Some(2L), 0, 20L), (None, 0, 30L), (None, 0, 31L),
      (Some(3L), 1, 40L))
      .toDF("user_id", "day", "v")
      .write.partitionBy("day").parquet(dir)

    val stats = Forget.forgetKeys(spark, dir, "user_id", Seq(1L), Seq("day"))
    assert(stats === Forget.Stats(partitionsRewritten = 1, rowsRemoved = 1))
    val back = spark.read.parquet(dir)
    // erased key gone, the two NULL-key rows in the rewritten partition
    // RETAINED — an isin anti-filter would have silently dropped them.
    assert(back.filter(col("user_id") === 1L).count() === 0)
    assert(back.filter(col("user_id").isNull).count() === 2)
    assert(back.count() === 4)
  }

  test("100k-key batch erases via broadcast join, not an isin literal") {
    val (dir, total) = buildLake()
    // 100k keys, of which only 3 and 6 exist in the lake (both day=0).
    val keys = spark.range(100000L).select((col("id") + 1000000L).as("k"))
      .union(Seq(3L, 6L).toDF("k"))
    // plan check on the rewrite shape: broadcast hash anti-join, and
    // no IN-list of key literals anywhere in the plan.
    val lake = spark.read.parquet(dir)
    val anti = lake.join(
      broadcast(keys.select(col("k").as("__forget_key")).distinct()),
      col("user_id") === col("__forget_key"), "left_anti")
    val plan = anti.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
    assert(!plan.contains(" IN ("), s"key IN-list leaked into plan:\n$plan")

    val stats = Forget.forgetKeyFrame(spark, dir, "user_id", keys, Seq("day"))
    assert(stats === Forget.Stats(partitionsRewritten = 1, rowsRemoved = 8))
    assert(spark.read.parquet(dir).count() === total - 8)
  }
}
