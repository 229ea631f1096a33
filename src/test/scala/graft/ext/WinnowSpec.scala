package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The split-criterion window form of winnowing must equal the
  * sliding-window definition exactly — verified by brute force over
  * thousands of seeded-random hash sequences (heavy ties included, the
  * regime where the rightmost-min rule actually bites), plus the
  * paper's coverage guarantee.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  // 400 docs, lengths 1..20, hash alphabet 0..6 → dense ties
  private lazy val cases: Seq[(Long, IndexedSeq[Long])] = {
    val rnd = new scala.util.Random(42)
    Seq.tabulate(400) { i =>
      (i.toLong, IndexedSeq.fill(1 + rnd.nextInt(20))(rnd.nextInt(7).toLong))
    }
  }

  private lazy val selectedByDoc: Map[Long, Set[Int]] = {
    val sh = cases
      .flatMap { case (doc, hs) => hs.zipWithIndex.map { case (h, p) => (doc, p, h) } }
      .toDF("doc_id", "pos", "h")
    Winnow.selected(sh, col("doc_id"), col("pos"), col("h"))
      .filter(col("sel")).select("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty)
  }

  test("window form ≡ sliding-window brute force on 400 seeded-random tie-heavy docs") {
    for ((doc, hs) <- cases) {
      val expected = Winnow.bruteForce(hs)
      assert(selectedByDoc(doc) == expected,
        s"doc $doc hs=$hs: got ${selectedByDoc(doc).toSeq.sorted}, " +
          s"want ${expected.toSeq.sorted}")
    }
  }

  test("coverage guarantee: every length-W window contains a selected position") {
    for ((doc, hs) <- cases if hs.length >= Winnow.W) {
      val sel = selectedByDoc(doc)
      for (j <- 0 to hs.length - Winnow.W)
        assert((j until j + Winnow.W).exists(sel), s"doc $doc window at $j uncovered")
    }
  }

  test("docs shorter than W select nothing; expected density sits near 2/(W+1)") {
    for ((doc, hs) <- cases if hs.length < Winnow.W)
      assert(selectedByDoc(doc).isEmpty)
    // density over long random sequences ≈ 2/(w+1) = 0.4 (ties push it
    // slightly down); assert a generous band over the pooled positions
    val longCases = cases.filter(_._2.length >= 10)
    val nPos = longCases.map(_._2.length).sum
    val nSel = longCases.map(c => selectedByDoc(c._1).size).sum
    val density = nSel.toDouble / nPos
    assert(density > 0.2 && density < 0.6, s"density=$density")
  }

  test("selection runs as ONE Window exec over the corpus shingle stream") {
    val sh = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(graft.ext.expr.ShingleMd5.shingleMd5(
          graft.ext.TextOps.tokens(lower(col("text"))), 3)))
      .toDF("doc_id", "pos", "h")
    val p = Winnow.selected(sh, col("doc_id"), col("pos"), col("h"))
      .queryExecution.executedPlan.toString
    val nWindow = p.linesIterator.count(_.trim.startsWith("+- Window"))
    assert(nWindow <= 1, s"expected a single fused Window operator:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }
}
