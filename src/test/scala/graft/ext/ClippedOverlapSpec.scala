package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.expr.ClippedOverlap

/** Kernel ≡ relational pin for [[ClippedOverlap]]: the codegen kernel
  * must emit, for every (ref, cand) row and every order n, exactly the
  * clipped-match / ref-total / cand-total triple the exploded
  * (doc, n, g) count + join derivation produces — the form that
  * remains the DuckDB oracle for bleu_corpus / rouge_n / chrf_eval.
  * Pinned on the real eval-metric corpus (token and char mode) and on
  * hand-built edges (repeats, multi-byte code points, short/empty).
  */
class ClippedOverlapSpec extends SparkSpec {

  /** The relational clipped-overlap the eval metrics used before
    * round 20: explode both sides' n-grams, count per (doc, n, g),
    * inner-join, Σ min — plus the per-side totals. */
  private def relational(pairs: DataFrame, gramsOf: (String, Int) => String,
      maxN: Int): DataFrame = {
    def grams(c: String) = (1 to maxN).map(n =>
      pairs.select(col("doc_id"), lit(n.toLong).as("n"),
        explode(expr(gramsOf(c, n))).as("g"))).reduce(_ unionByName _)
    val rc = grams("ref").groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("cr"))
    val cc = grams("cand").groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("cc"))
    val m = rc.join(cc, Seq("doc_id", "n", "g"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(least(col("cr"), col("cc"))).as("m"))
    rc.groupBy(col("doc_id"), col("n")).agg(sum(col("cr")).as("r"))
      .join(cc.groupBy(col("doc_id"), col("n")).agg(sum(col("cc")).as("c")),
        Seq("doc_id", "n"), "full")
      .join(m, Seq("doc_id", "n"), "left")
      .select(col("doc_id"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"),
        coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("c"), lit(0L)).as("c"))
  }

  private def tokenGramSql(side: String, n: Int): String =
    if (n == 1) side
    else {
      val parts = (0 until n)
        .map(j => s"element_at($side, CAST(i + $j AS INT))").mkString(", ")
      s"CASE WHEN size($side) >= $n THEN " +
        s"transform(sequence(1, size($side) - ${n - 1}), " +
        s"i -> concat_ws(' ', $parts)) ELSE array() END"
    }

  private def charGramSql(side: String, n: Int): String =
    s"CASE WHEN length($side) >= $n THEN " +
      s"transform(sequence(1, length($side) - $n + 1), " +
      s"i -> substr($side, i, $n)) ELSE CAST(array() AS ARRAY<STRING>) END"

  /** Explode the kernel array back to (doc_id, n, m, r, c) rows. */
  private def kernelRows(kr: DataFrame, maxN: Int): DataFrame =
    kr.select(col("doc_id"), explode(expr(
      s"transform(sequence(1, $maxN), n -> struct(CAST(n AS BIGINT) AS n, " +
        "ov[CAST(3 * (n - 1) AS INT)] AS m, " +
        "ov[CAST(3 * (n - 1) + 1 AS INT)] AS r, " +
        "ov[CAST(3 * (n - 1) + 2 AS INT)] AS c))")).as("t"))
      .select(col("doc_id"), col("t.n"), col("t.m"), col("t.r"), col("t.c"))

  private def assertEqual(pairs: DataFrame, maxN: Int, chars: Boolean): Unit = {
    val kr = pairs.select(col("doc_id"),
      ClippedOverlap.of(col("ref"), col("cand"), maxN).as("ov"))
    val krows = kernelRows(kr, maxN)
    val rel = relational(pairs,
      if (chars) charGramSql else tokenGramSql, maxN)
    // relational drops (doc, n) rows where NEITHER side has grams;
    // the kernel emits explicit zeros there — compare on the union
    // with zero-fill, which must agree everywhere.
    val j = krows.withColumnRenamed("m", "km")
      .withColumnRenamed("r", "kr").withColumnRenamed("c", "kc")
      .join(rel, Seq("doc_id", "n"), "full")
    val bad = j.filter(
      col("km").isNull ||
        coalesce(col("m"), lit(0L)) =!= col("km") ||
        coalesce(col("r"), lit(0L)) =!= col("kr") ||
        coalesce(col("c"), lit(0L)) =!= col("kc")).count()
    assert(bad === 0L, "kernel != relational clipped overlap")
  }

  test("token mode equals the relational form on the eval-metric corpus") {
    val pairs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ref"))
      .withColumn("cand",
        expr("slice(ref, 1, CAST(greatest(size(ref) - 3, 1) AS INT))"))
    assertEqual(pairs, maxN = 4, chars = false)
  }

  test("char mode equals the relational form on the eval-metric corpus") {
    val pairs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), array_join(col("tk"), "").as("ref"),
        array_join(expr(
          "slice(tk, 1, CAST(greatest(size(tk) - 3, 1) AS INT))"), "")
          .as("cand"))
    assertEqual(pairs, maxN = 3, chars = true)
  }

  test("edges: repeats clip, disjoint zero, multi-byte code points, empty") {
    import spark.implicits._
    val tok = Seq(
      // repeated grams: ref has 3×"a", cand 5×"a" → m_1 clips at 3
      (1L, Seq("a", "a", "a", "b"), Seq("a", "a", "a", "a", "a")),
      // disjoint
      (2L, Seq("x", "y"), Seq("z")),
      // cand empty
      (3L, Seq("p", "q"), Seq.empty[String]),
      // both empty
      (4L, Seq.empty[String], Seq.empty[String]),
      // bigram overlap with different unigram order
      (5L, Seq("a", "b", "c"), Seq("b", "c", "a"))
    ).toDF("doc_id", "ref", "cand")
    assertEqual(tok, maxN = 3, chars = false)
    val ch = Seq(
      (1L, "ααββ", "αβ"), // multi-byte: code-point windows, not bytes
      (2L, "aaab", "aaaaa"),
      (3L, "xy", ""),
      (4L, "", ""),
      (5L, "日本語の文字列", "日本語")
    ).toDF("doc_id", "ref", "cand")
    assertEqual(ch, maxN = 3, chars = true)
  }

  test("kernel layout: [m, r, c] per order, totals are window counts") {
    import spark.implicits._
    val out = Seq((1L, Seq("a", "b", "a"), Seq("a", "b")))
      .toDF("doc_id", "ref", "cand")
      .select(ClippedOverlap.of(col("ref"), col("cand"), 2).as("ov"))
      .as[Seq[Long]].collect().head
    // n=1: m = |{a,b}| clipped = 2, r = 3, c = 2
    // n=2: "a b"/"b a" vs "a b" → m = 1, r = 2, c = 1
    assert(out === Seq(2L, 3L, 2L, 1L, 2L, 1L))
  }
}
