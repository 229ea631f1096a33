package graft.tools

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    for (q <- Seq("priority_count", "late_lines")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.1").count()
      println(f"PROBE $q ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    s.stop()
  }
}
