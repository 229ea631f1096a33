package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.expr.SortedSetOps

/** Kernel ≡ built-in pin for [[graft.ext.expr.SortedSetOps]] (round
  * 21): `sortDistinct` must equal `array_sort(array_distinct(...))`
  * and `intersectCount` over its output must equal
  * `size(array_intersect(...))` — the built-ins the simjoin verify
  * stage used before the kernel swap. Pinned on hand-built edges
  * (duplicates, empties, disjoint/identical, negatives around the
  * 60-bit hash range) and on the real shingle-set frame at sf0.001.
  */
class SortedSetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sortDistinct == array_sort(array_distinct) on hand-built edges") {
    val rows = Seq(
      Seq(5L, 3L, 5L, 1L, 3L),
      Seq.empty[Long],
      Seq(7L),
      Seq(7L, 7L, 7L),
      Seq(Long.MaxValue, 0L, 1L << 60, -1L, Long.MinValue),
      (1L to 100L).reverse ++ (1L to 100L))
    val df = rows.toDF("a")
      .select(SortedSetOps.sortDistinct(col("a")).as("k"),
        array_sort(array_distinct(col("a"))).as("b"))
    assert(df.filter(col("k") =!= col("b")).count() === 0)
  }

  test("intersectCount == size(array_intersect) on sorted-distinct pairs") {
    val rows = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 3L, 4L, 5L)),          // partial overlap
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),              // identical
      (Seq(1L, 2L), Seq(3L, 4L)),                      // disjoint
      (Seq.empty[Long], Seq(1L)),                      // empty side
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MinValue, -5L, 0L, Long.MaxValue), Seq(-5L, Long.MaxValue)),
      ((1L to 1000L).toSeq, (500L to 1500L).toSeq))
    val df = rows.toDF("a", "b")
      .select(SortedSetOps.intersectCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("s"))
    assert(df.filter(col("k") =!= col("s")).count() === 0)
  }

  test("verify stage over kernel == array_intersect on the real corpus") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val ds = Dedup.similarityJoin(docs, col("doc_id"), col("text"), 1, 2)
    // reference: the pre-round-21 formulation (array_distinct sets +
    // size(array_intersect)) — must produce the identical pair frame
    val sets = docs.select(col("doc_id").as("doc"), array_distinct(
        graft.ext.expr.ShingleMd5.shingleMd5(
          TextOps.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("len", size(col("sh")).cast("long"))
    val ref = ds.select(col("doc_a"), col("doc_b"))
      .join(sets.select(col("doc").as("doc_a"), col("sh").as("sh_a"),
        col("len").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc").as("doc_b"), col("sh").as("sh_b"),
        col("len").as("nb")), Seq("doc_b"))
      .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b")))
        .cast("long"))
      .withColumn("nu", col("na") + col("nb") - col("ni"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ni").cast("double") / col("nu"), 4).as("jaccard"))
    assert(ds.exceptAll(ref).count() === 0)
    assert(ds.count() === ref.count() && ds.count() > 0)
  }
}
