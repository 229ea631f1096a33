package graft.tools

/** Dev scratch runner (see .claude/skills/verify) — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- Seq("sample_shard", "pii_scrub", "dedup_corpus"); r <- 1 to 3) {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(s, sf).count()
      System.err.println(f"[scratch] $q%-18s run$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    s.stop()
  }
}
