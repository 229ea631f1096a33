package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Forget.forgetKeys: targeted erasure rewrites ONLY the partitions
  * holding the keys; everything else keeps its exact files. */
class ForgetSpec extends SparkSpec {
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
}
