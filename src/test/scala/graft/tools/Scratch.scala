package graft.tools

/** Scratch pad for sbt-driven experiments (test scope — kept out of
  * the shipped tree). Edit, then `sbt -batch "Test/runMain
  * graft.tools.Scratch"`. See .claude/skills/verify/SKILL.md. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    println("scratch: session up, nothing to do")
    s.stop()
  }
}
