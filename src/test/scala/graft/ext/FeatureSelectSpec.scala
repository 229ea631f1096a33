package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand cases for MI feature selection (the DuckDB oracle gates the
  * corpus-scale feature_mi query).
  */
class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  // 8 docs, 4 keep / 4 drop; "signal" tracks the label exactly,
  // "ubiquitous" is in every doc, "rare" is in one kept doc.
  private def fixture = {
    val labeled = Seq.tabulate(8)(i => (i.toLong, i < 4)).toDF("doc_id", "keep")
    val pres = Seq.tabulate(8) { i =>
      val base = Seq((i.toLong, i < 4, "ubiquitous"))
      val sig = if (i < 4) Seq((i.toLong, true, "signal")) else Nil
      val rare = if (i == 0) Seq((0L, true, "rare")) else Nil
      base ++ sig ++ rare
    }.flatten.toDF("doc_id", "keep", "term")
    (labeled, pres)
  }

  test("perfectly label-aligned term maximizes MI; ubiquitous term scores 0") {
    val (labeled, pres) = fixture
    val out = FeatureSelect.mutualInfo(labeled, pres, vocabK = 10, topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n11"), r.getAs[Long]("n10"), r.getAs[Long]("n01"),
          r.getAs[Long]("n00"), r.getAs[Long]("mi_num"), r.getAs[Long]("mi_x1e6")))
      .toMap
    // signal: cells (4,0,0,4) — MI = ln 2 exactly; at 1e6 scale the
    // floored-per-cell sum is 8·693147/8 = 693147
    assert(out("signal")._1 == 4L && out("signal")._2 == 0L &&
      out("signal")._3 == 0L && out("signal")._4 == 4L)
    assert(out("signal")._6 == 693147L)
    // ubiquitous: present everywhere → every cell ratio is 1 → MI 0
    assert(out("ubiquitous")._5 == 0L && out("ubiquitous")._6 == 0L)
    // rare-but-aligned sits strictly between
    assert(out("rare")._6 > 0L && out("rare")._6 < out("signal")._6)
  }

  test("ranking is by signed mi_num desc with the term tiebreak; topK truncates") {
    val (labeled, pres) = fixture
    val top = FeatureSelect.mutualInfo(labeled, pres, vocabK = 10, topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top.head == "signal")
    assert(top.length == 2)
  }

  test("tokenless docs still count in the population totals") {
    val labeled = (Seq.tabulate(8)(i => (i.toLong, i < 4)) :+ ((8L, false)))
      .toDF("doc_id", "keep")
    val pres = fixture._2
    val out = FeatureSelect.mutualInfo(labeled, pres, vocabK = 10, topK = 10)
      .filter(col("term") === "signal").head()
    // n00 now includes the tokenless dropped doc: (4,0,0,5)
    assert(out.getAs[Long]("n00") == 5L)
  }
}
