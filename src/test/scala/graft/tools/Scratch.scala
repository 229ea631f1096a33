package graft.tools

/** Scratch pad for sbt-driven experiments (test scope — kept out of
  * the shipped tree). Edit, then `sbt -batch "Test/runMain
  * graft.tools.Scratch"`. See .claude/skills/verify/SKILL.md. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val df = graft.SparkEntry.queries("lake_rename")(s, sf)
      println(s"SCRATCH $sf schema=${df.schema.simpleString}")
      df.collect().foreach(r => println(s"SCRATCH $sf row=$r"))
    }
    s.stop()
  }
}
