package graft.tools

/** Dump `.explain("formatted")` for named registry queries to files —
  * the round-20 optimization-evidence trail (plans/r20/<q>_before.txt /
  * _after.txt). Test scope, never ships.
  * Usage: Test/runMain graft.tools.PlanDump <outDir> <suffix> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names @ _*) = args: @unchecked
    val s = graft.GraftSession.local("graft-plan-dump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.01")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        p.getBytes("UTF-8"))
      System.err.println(s"[plan-dump] wrote $outDir/${n}_$suffix.txt")
    }
    s.stop()
  }
}
