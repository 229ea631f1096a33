package graft.tools

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val sf = "/root/testdata/sf0.1"
    s.range(1000000L).selectExpr("sum(id)").collect()
    for (name <- Seq("dedup_groups_df", "grouped_topk")) {
      val ts = (1 to 3).map { _ =>
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(s, sf).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $name med=${ts.map(_._1).sorted.apply(1)}%.2fs " +
        f"all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    s.stop()
  }
}
