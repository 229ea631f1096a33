package graft.tools

/** Dev scratch runner (see .claude/skills/verify) — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(s).count())
    s.stop()
  }
}
