package graft.tools

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val sf = "/root/testdata/sf0.1"
    s.range(1000000L).selectExpr("sum(id)").collect()
    s.catalog.clearCache()
    for (name <- Seq("ivf_topk", "dedup_groups_df", "dedup_groups", "dedup_minhash")) {
      val ts = (1 to 3).map { _ =>
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(s, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name med=${ts.sorted.apply(1)}%.2fs all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    s.stop()
  }
}
