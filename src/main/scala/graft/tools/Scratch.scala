package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — contents are transient. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-scratch")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
