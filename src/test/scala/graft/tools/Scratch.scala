package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: timing probe for the semdedup norm-precompute rework
  * (self-norms computed once per vector in `assigned` instead of three
  * 64-dim integer dots per candidate pair in the within-cluster
  * self-join). Runs the registry query verbatim at sf0.1, 3 passes,
  * reports each pass (min-of-passes is the bench stat). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (r <- 1 to 3) {
      clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("semdedup")(s, sf).count()
      System.err.println(
        f"[probe] semdedup r$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    s.stop()
  }
}
