package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton implementation for cross-checking the Column
    * expression (plain Scala, written independently of the bit loop). */
  private def mortonRef(x: Long, y: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 16) {
      out |= ((x >> i) & 1L) << (2 * i)
      out |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  test("interleave16 known values") {
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0L, 0L),
      (0xFFFFL, 0xFFFFL))
      .toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L, 0xFFFFFFFFL))
  }

  test("interleave16 matches reference on a value sweep and masks high bits") {
    val pts = for (i <- 0 until 500) yield (i * 2654435761L % 100000L,
      i * 40503L % 100000L)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == mortonRef(x & 0xFFFFL, y & 0xFFFFL), s"($x,$y)")
    }
  }

  test("interleave16Sql is the same function (DuckDB-shaped arithmetic)") {
    // Evaluate the generated SQL in Spark itself: the expression uses
    // only >> & << | which parse identically, so equality here plus the
    // zorder_cluster oracle equals cross-engine agreement.
    val sqlForm = expr(ZOrder.interleave16Sql("x", "y"))
    val rows = Seq((12345L, 54321L), (1L, 2L), (65535L, 32768L))
      .toDF("x", "y")
      .select((ZOrder.interleave16(col("x"), col("y")) === sqlForm).as("eq"))
      .collect()
    assert(rows.forall(_.getBoolean(0)))
  }

  test("clusterWrite gives per-file pruning on BOTH dimensions") {
    // 128×128 uniform grid scaled to the 16-bit domain.
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128L * 512L).as("x"),
      (expr("id div 128") * 512L).as("y"))
    val dir = Files.createTempDirectory("zorder").toString
    ZOrder.clusterWrite(grid, col("x"), col("y"), numFiles = 16, path = s"$dir/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/xsort")

    def fileBoxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zBoxes = fileBoxes(s"$dir/z")
    val xBoxes = fileBoxes(s"$dir/xsort")
    assert(zBoxes.length == 16 && xBoxes.length == 16)

    // Files a scan must read for a narrow band on each dimension
    // (min/max overlap test — exactly what parquet footer pruning does).
    def overlapping(boxes: Array[(Long, Long, Long, Long)],
        lo: Long, hi: Long, onY: Boolean): Int =
      boxes.count { case (x0, x1, y0, y1) =>
        if (onY) y0 <= hi && y1 >= lo else x0 <= hi && x1 >= lo
      }

    val band = 4096L // 1/16 of the domain
    // x-sorted layout: every file spans all of y — zero pruning on y.
    assert(overlapping(xBoxes, 0, band, onY = true) == 16)
    // z-ordered: both dimensions prune to a fraction of the files.
    assert(overlapping(zBoxes, 0, band, onY = true) <= 8)
    assert(overlapping(zBoxes, 0, band, onY = false) <= 8)

    // The clustered copy is the same data.
    val z = spark.read.parquet(s"$dir/z")
    assert(z.count() == 128L * 128L)
    assert(z.agg(sum(col("x") + col("y"))).head.getLong(0) ==
      grid.agg(sum(col("x") + col("y"))).head.getLong(0))
  }
}
