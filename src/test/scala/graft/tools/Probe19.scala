package graft.tools

/** Round-19 probe harness (test scope — never ships): log-file PARSE
  * COUNTS at long history (VERDICT r18 punch #5). The feature gate
  * claims zero extra folds and `changesByVersion` claims K+1 log
  * reads for a K-version window — both previously argued from code;
  * this records them from the `logFilesParsed` counter on a
  * 20-commit vs 200-commit lake (checkpointInterval = 10, CDF on,
  * every 8th commit a MOR delete so dv/cdc lines and feature stamps
  * are all in play).
  *
  * A second mode (`dv`) probes the round-19 DV-aware V2 batch read
  * 1×→10×: orders-sized lakes with ~1% MOR-deleted keys, connector
  * read wall vs Lake.read(), row counts REQUIREd equal.
  *
  * Usage: Test/runMain graft.tools.Probe19 [parses|dv|all]
  */
object Probe19 {
  private def pr(m: String): Unit = System.err.println(s"[p19] $m")

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("parses")
    val s = graft.GraftSession.local("graft-probe19")
    if (what == "parses" || what == "all") parses19(s)
    if (what == "dv" || what == "all") dvRead(s)
    s.stop()
  }

  /** DV-aware connector batch read 1×→10× (round-19 punch #1). */
  private def dvRead(s: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = Seq(time(body), time(body)).min
    Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1").foreach { case (label, d) =>
      val root = java.nio.file.Files
        .createTempDirectory(s"p19dv-$label-").toString
      val lake = graft.io.Snapshot.Lake(s, root, statsCols = Seq("k"))
      val o = graft.Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        col("o_totalprice").as("price"))
      lake.append(o)
      graft.io.Compact.clusterBy(lake, "k", 16)
      lake.deleteKeysMor(o.filter(pmod(col("k"), lit(97L)) === 0)
        .select("k"), "k") // ~1% masked across every file
      val fmt = "graft.io.v2.SnapshotStreamSource"
      val viaConnector = () => s.read.format(fmt).load(root).count()
      val viaLake = () => lake.read().count()
      val nC = s.read.format(fmt).load(root).count()
      val nL = lake.read().count()
      require(nC == nL, s"DV connector read diverged: $nC != $nL")
      val tC = minOf2(viaConnector())
      val tL = minOf2(viaLake())
      pr(f"$label DV'd connector batch read: $nC%d rows, " +
        f"connector $tC%.2f s vs Lake.read $tL%.2f s (counts equal)")
    }
  }

  private def parses19(s: org.apache.spark.sql.SparkSession): Unit = {
    import s.implicits._

    def build(n: Int): graft.io.Snapshot.Lake = {
      val root = java.nio.file.Files
        .createTempDirectory(s"p19-$n-").toString
      val lake = graft.io.Snapshot.Lake(s, root, statsCols = Seq("k"),
        checkpointInterval = 10, changeDataFeed = true)
      (0 until n).foreach { i =>
        if (i % 8 == 7)
          lake.deleteKeysMor(Seq((i - 1) * 100L).toDF("k"), "k")
        else
          lake.append((i * 100L until i * 100L + 50L)
            .map(k => (k, s"v$k")).toDF("k", "v"))
      }
      lake
    }

    def parses(body: => Unit): Long = {
      graft.io.Snapshot.logFilesParsed.set(0L)
      body
      graft.io.Snapshot.logFilesParsed.get()
    }

    Seq(20, 200).foreach { n =>
      val lake = build(n)
      val lv = lake.latestVersion
      // head read: checkpoint + suffix fold (feature-gated — the gate
      // rides the fold the read already pays)
      val head = parses(lake.read().count())
      // 10-version CDF window: the K+1 claim (one fold for the window
      // start + one commit parse per version)
      val cdf = parses(lake.changesByVersion(lv - 10, lv).count())
      // the gated state fold alone (what every state-shaped read pays)
      val fold = parses(lake.liveState(lv))
      // time travel BELOW the last checkpoint (directory-scan +
      // earlier checkpoint + its suffix)
      val tt = parses(lake.readAsOf(lv / 2).count())
      pr(s"history=$n (head v$lv, interval 10): " +
        s"head-read parses=$head, CDF(v${lv - 10}, v$lv) parses=$cdf, " +
        s"gated-fold parses=$fold, readAsOf(v${lv / 2}) parses=$tt")
    }
  }
}
