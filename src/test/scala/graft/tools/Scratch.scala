package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: post-checkpoint timings for the three text scorers. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    for (q <- Seq("tfidf_topk", "bm25_topk", "unigram_logprob")) {
      val ts = (1 to 3).map { _ =>
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime(); val n = graft.SparkEntry.queries(q)(s, sf).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      System.err.println(f"[probe] $q%-18s min=${ts.map(_._1).min}%6.2fs rows=${ts.head._2}")
    }
    s.stop()
  }
}
