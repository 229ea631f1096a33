package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime
      val g = graft.SparkEntry.queries("dedup_groups")(s, d)
      val rows = g.count()
      val sizes = g.agg(sum("group_size"), max("group_size")).collect()(0)
      println(f"PROBE $d groups=$rows members=${sizes.getLong(0)} maxsize=${sizes.getLong(1)} ${(System.nanoTime-t0)/1e9}%.1fs")
    }
    s.stop()
  }
}
