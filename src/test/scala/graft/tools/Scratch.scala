package graft.tools

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * 10× scale probes for assoc_rules / graph_triangles / autocorr /
  * unpivot_metrics (SCALE.md rows). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for (name <- Seq("assoc_rules", "graph_triangles", "autocorr",
        "unpivot_metrics")) {
      for ((label, dir) <- Seq(
          "1x" -> "/root/testdata/sf0.01", "10x" -> "/root/testdata/sf0.1")) {
        val runs = (1 to 2).map { _ =>
          time(graft.SparkEntry.queries(name)(s, dir)
            .write.mode("overwrite").format("noop").save())
        }
        System.err.println(f"[probe] $name@$label  min=${runs.min}%.2fs  runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      }
    }
    s.stop()
  }
}
