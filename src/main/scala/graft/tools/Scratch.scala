package graft.tools

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("embed_quantize")(s, "/root/testdata/sf0.1").count()
    println(f"PROBE embed_quantize ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    s.stop()
  }
}
