package graft.ext

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.expr.CdcCuts

/** Kernel ≡ relational pin for [[CdcCuts]]: the codegen kernel must
  * emit, for every doc, exactly the cut array the row-exploded
  * relational derivation produces (the form that remains the DuckDB
  * oracle for `cdc_chunks`) — including the preamble-shifted copies
  * the query plants, multi-byte characters, and the short-text edge
  * cases the corpus filter excludes.
  */
class CdcCutsSpec extends SparkSpec {

  /** The relational cut derivation cdc_chunks used before round 14 —
    * one row per character, filtered on the window hash, regrouped. */
  private def relationalCuts(corpus: org.apache.spark.sql.DataFrame,
      w: Int, mod: Long) =
    corpus
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
      .filter(col("len") >= w.toLong)
      .select(col("doc_id"), col("text"), col("len"),
        explode(expr(s"sequence(CAST($w AS BIGINT), len)")).as("p"))
      .filter(pmod(Dedup.md5Hash60(
          expr(s"substr(text, CAST(p AS INT) - ${w - 1}, $w)")),
          lit(mod)) === 0L ||
        col("p") === col("len"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("p"))).as("cps"))

  test("kernel equals the relational form on the full cdc corpus") {
    val CopyOff = 17000000000L
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val copies = base.filter(pmod(col("doc_id"), lit(2L)) === 0)
      .select((col("doc_id") + CopyOff).as("doc_id"),
        concat(lit("preamble insert block "), col("text")).as("text"))
    val corpus = base.unionByName(copies)
      .filter(length(col("text")) >= 8)
    val kernel = corpus.select(col("doc_id"),
      CdcCuts.cdcCuts(col("text"), 8, 64L).as("kps"))
    val joined = relationalCuts(corpus, 8, 64L)
      .join(kernel, Seq("doc_id"), "full_outer")
    val nDocs = corpus.count()
    assert(joined.count() === nDocs, "one row per doc on both sides")
    val mismatches = joined
      .filter(col("cps").isNull || col("kps").isNull ||
        col("cps") =!= col("kps"))
      .count()
    assert(mismatches === 0L, "every doc's kernel cuts = relational cuts")
  }

  test("kernel equals the relational form on multi-byte text and other (w, mod)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "héllo wörld — ünïcode text with émbedded ß and 日本語の文字列 mixed in"),
      (2L, "plain ascii text of moderate length for the window walk"),
      (3L, "ααββγγδδεεζζηηθθ"), // all multi-byte
      (4L, "12345678"), // len == w exactly
      (5L, "éèêëàâäîïôöùûüÿç plus more accented ligature œæ text")
    ).toDF("doc_id", "text")
    for ((w, mod) <- Seq((8, 64L), (4, 16L), (1, 2L))) {
      val kernel = docs.select(col("doc_id"),
        CdcCuts.cdcCuts(col("text"), w, mod).as("kps"))
      val bad = relationalCuts(docs, w, mod)
        .join(kernel, Seq("doc_id"), "full_outer")
        .filter(col("cps").isNull || col("kps").isNull ||
          col("cps") =!= col("kps"))
        .count()
      assert(bad === 0L, s"w=$w mod=$mod")
    }
  }

  test("short and empty texts: single terminal cut / empty array") {
    import spark.implicits._
    val out = Seq((1L, "short"), (2L, ""), (3L, "1234567"), (4L, "ß"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), CdcCuts.cdcCuts(col("text"), 8, 64L).as("kps"))
      .orderBy("doc_id")
      .as[(Long, Seq[Long])].collect()
    assert(out(0)._2 === Seq(5L))
    assert(out(1)._2 === Seq.empty[Long])
    assert(out(2)._2 === Seq(7L))
    assert(out(3)._2 === Seq(1L))
  }

  test("terminal position is always present exactly once") {
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 8)
    val bad = corpus.select(
        CdcCuts.cdcCuts(col("text"), 8, 64L).as("kps"),
        length(col("text")).cast("long").as("len"))
      .filter(element_at(col("kps"), -1) =!= col("len") ||
        size(array_distinct(col("kps"))) =!= size(col("kps")))
      .count()
    assert(bad === 0L)
  }
}
