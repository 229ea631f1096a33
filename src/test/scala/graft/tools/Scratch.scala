package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: timing probe for the LongDot codegen kernel swap in
  * semdedup (idot/idist2 were interpreted aggregate(zip_with) HOFs —
  * allocated per candidate pair in the within-cluster self-join). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    for (r <- 1 to 3) {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("semdedup")(s, sf).count()
      System.err.println(
        f"[probe] semdedup r$r ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    s.stop()
  }
}
