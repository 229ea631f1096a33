package graft.tools

/** Whitelist regenerator for PlanDisciplineSpec: walks every registry
  * query at sf0.001 and prints ready-to-paste Scala map entries for
  * the two discipline whitelists. Run when a legitimate new bounded
  * frame is added:
  *
  *   sbt "Test/runMain graft.tools.PlanWalk"
  *
  * Review every NEW line before pasting — an entry is an assertion
  * that the frame is provably bounded at 100 TB, not a rubber stamp.
  */
object PlanWalk {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("planwalk")
    val sf = "/root/testdata/sf0.001"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val wins = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    val hints = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val w = PlanSigs.unpartitionedWindowSigs(df)
      val b = PlanSigs.broadcastHintSigs(df)
      if (w.nonEmpty) wins(n) = w
      if (b.nonEmpty) hints(n) = b
      System.err.println(s"walked $n: W=${w.size} B=${b.size}")
    }
    def dump(varName: String, m: collection.Map[String, Seq[String]]): Unit = {
      println(s"  private val $varName: Map[String, Seq[String]] = Map(")
      val lines = m.toSeq.sortBy(_._1).map { case (k, v) =>
        s"""    "$k" -> Seq(${v.map(s => s""""$s"""").mkString(", ")})"""
      }
      println(lines.mkString(",\n"))
      println("  )")
    }
    dump("AllowedUnpartitionedWindows", wins)
    println()
    dump("AllowedBroadcastHints", hints)
    spark.stop()
  }
}
