package graft.tools
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("plan-check")
    val p = graft.SparkEntry.queries("cusum_shift")(s, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    System.err.println(p.linesIterator.filter(l => l.contains("Window") || l.contains("Exchange") || l.contains("Sort ") || l.contains("Join")).mkString("\n"))
    s.stop()
  }
}
