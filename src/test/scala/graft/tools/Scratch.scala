package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: print executed plans for the round-6 additions so the
  * PlanSpec assertions guard the shapes actually produced. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("forecast_revenue", "returned_customers", "top_supplier")) {
      System.err.println(s"===== $q =====")
      System.err.println(
        graft.SparkEntry.queries(q)(s, sf).queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
