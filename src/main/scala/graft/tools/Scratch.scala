package graft.tools

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`.
  * Current body: driver-contract smoke — entry() rows at sf0.001. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    println(s"PROBE entry_rows=${graft.SparkEntry.entry(s).count()}")
    s.stop()
  }
}
