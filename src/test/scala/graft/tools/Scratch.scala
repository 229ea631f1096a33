package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * plan audit of the round-8 additions. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    for (n <- Seq("substring_dedup", "dsir_weights", "link_rank")) {
      val p = graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      System.err.println(s"==== $n ====")
      System.err.println(p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("parquet") || l.contains("HashAggregate"))
        .take(30).mkString("\n"))
    }
    s.stop()
  }
}
