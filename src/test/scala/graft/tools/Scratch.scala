package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: 10× scale probes (sf0.01 → sf0.1) for the round-6 text
  * scorers bm25_topk and unigram_logprob: both are explode → hash-agg
  * trees, so time should scale ~linearly with token volume and show no
  * serialization point. 3 passes each, min-of-passes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    for {
      q <- Seq("bm25_topk", "unigram_logprob")
      sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    } {
      val times = (1 to 3).map { _ =>
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(s, sf).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      System.err.println(
        f"[probe] $q%-16s $sf%-24s min=${times.map(_._1).min}%6.2fs rows=${times.head._2}")
    }
    s.stop()
  }
}
