package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * round-10 SCALE.md probes — (a) 10× wall rows for the new queries
  * (corpus_pipeline, bpe_train, bigram_logprob, ann_recall), (b) the
  * containment_join 10× row at the sf1 replica corpus, (c) the
  * ADVERSARIAL high-df boilerplate probe for both exact similarity
  * joins, recording candidate volume vs true output size (the
  * output-boundedness claim from VERDICT r9 §watch-item). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    import graft.ext.Dedup
    import graft.queries.ExtQueries
    val dir = "/tmp/graft_sf1"
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = Seq(time(body), time(body)).min
    def pr(msg: String): Unit = System.err.println(s"[probe] $msg")

    // ---- regenerate the sf1 replica corpus (round-9 convention) ------
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      (0 until 10).map(k => docs.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      pr(s"generated sf1 documents at $dir")
    }

    // ---- (a) 10× wall rows: new round-10 queries ---------------------
    for (name <- Seq("corpus_pipeline", "bpe_train", "bigram_logprob",
        "ann_recall");
        (label, d) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
          "sf0.1" -> "/root/testdata/sf0.1")) {
      val t = minOf2(graft.SparkEntry.queries(name)(s, d)
        .write.mode("overwrite").format("noop").save())
      pr(f"$name@$label  min=$t%.2fs")
    }

    // ---- (b) containment_join 10× row at sf1 -------------------------
    for ((label, d) <- Seq("sf0.1" -> "/root/testdata/sf0.1",
        "sf1" -> dir)) {
      var rows = 0L
      val t = minOf2 {
        rows = graft.SparkEntry.queries("containment_join")(s, d).count()
      }
      pr(f"containment_join@$label  min=$t%.2fs  outPairs=$rows")
    }

    // ---- (c) adversarial boilerplate-farm probe ----------------------
    // 1,000 near-identical docs: one ~sf0.1 doc's text + a unique
    // 1-token suffix per copy. TRUE output is quadratic (every pair is
    // a near-dup) — the worst case for any similarity join. The claim
    // under test: candidate volume stays ~output-sized (the prefix
    // filter may not save work that genuinely exists, but must not
    // blow up BEYOND it).
    val baseText = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    val farm = s.range(1000).select(col("id").as("doc_id"),
      concat(lit(baseText), lit(" uniq"), col("id").cast("string"))
        .as("text"))
    val ds = Dedup.hashedShingleSets(farm, col("doc_id"), col("text"), 3)
    for ((nm, thrN, thrD,
        candF, outF) <- Seq(
      ("simjoin(3/5)", 3, 5,
        () => Dedup.similarityCandidates(ds, 3, 5).count(),
        () => Dedup.similarityJoin(farm, col("doc_id"), col("text"), 3, 5)
          .count()),
      ("containment(9/10)", 9, 10,
        () => Dedup.containmentCandidates(ds, 9, 10).count(),
        () => Dedup.containmentJoin(farm, col("doc_id"), col("text"), 9, 10)
          .count()))) {
      val nCand = candF()
      var nOut = 0L
      val t = minOf2 { nOut = outF() }
      val allPairs = 1000L * 999 / 2
      pr(f"boilerplate-farm $nm  docs=1000 allPairs=$allPairs " +
        f"candidates=$nCand truePairs=$nOut min=$t%.2fs " +
        f"candPerOut=${nCand.toDouble / math.max(nOut, 1)}%.2f")
    }
    s.stop()
  }
}
