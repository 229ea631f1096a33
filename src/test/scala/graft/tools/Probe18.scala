package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 probe harness (test scope — never ships):
  *
  *  - `cdcmv`: lake_cdc_mv min-of-3 at sf0.1 (VERDICT r17 item 1 —
  *    the mechanical tracker's first flag), plus a per-changes()
  *    decomposition so a real regression attributes to the fold, the
  *    diff plan, or ambient load.
  *  - `mapped`: the round-17 mapping read paths 1×→10× (VERDICT item
  *    5): mapped head read, mapped CDC window, mapped zone-prune.
  *  - `dedup10x`: the dedup chain on a ~1M-doc synthetic corpus
  *    (VERDICT item 6): minhashPairs → dedupGroups → keep-best wall
  *    times, plus the union-find vs Pregel regime A/B on the SAME
  *    edge set (equality + time).
  *
  * Usage: Test/runMain graft.tools.Probe18 [cdcmv|mapped|dedup10x|all]
  */
object Probe18 {
  private def pr(m: String): Unit = System.err.println(s"[p18] $m")
  private def load(): String = {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.mkString.trim.split("\\s+").take(3).mkString(",")
    finally src.close()
  }
  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }
  private def minOf(n: Int)(body: => Unit): Double =
    (1 to n).map(_ => time(body)).min

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("all")
    val s = graft.GraftSession.local("graft-probe18")
    pr(s"loadavg at start: ${load()}")

    if (what == "cdcmv" || what == "all") cdcmv(s)
    if (what == "mapped" || what == "all") mapped(s)
    if (what == "cdf" || what == "all") cdf(s)
    if (what == "dedup10x" || what == "all") dedup10x(s)
    pr(s"loadavg at end: ${load()}")
    s.stop()
  }

  private def cdcmv(s: SparkSession): Unit = {
    val d = "/root/testdata/sf0.1"
    def run(): Unit = graft.SparkEntry.queries("lake_cdc_mv")(s, d).count()
    run() // builds the shared ordersLake fixture + JIT warm
    val t = minOf(5)(run())
    pr(f"lake_cdc_mv sf0.1 min-of-3 = $t%.3f s (r16 minima 1.54 s; r17 flagged 2.15 s) loadavg=${load()}")
    // decomposition: one changes(v-1, v) per version, plan+count
    val lake = {
      // same fixture the query opens (idempotent per-JVM cache)
      graft.SparkEntry.queries("lake_mor_delete")(s, d).count()
      graft.queries.ExtQueries.ordersLakeForProbe(s, d)
    }
    (0 to 4).foreach { v =>
      graft.io.Snapshot.logFilesParsed.set(0L)
      val tc = minOf(2)(lake.changes(v - 1, v).count())
      pr(f"  changes(${v - 1}, $v) min-of-2 = $tc%.3f s logFilesParsed=${graft.io.Snapshot.logFilesParsed.get()}")
    }
    // A/B: the SAME fixture with every meta line stripped — the
    // legacy (footer-union) changes() path vs the mapping-aware
    // (recorded-schema + rename-projection) one. Attributes the r17
    // flag: if no-meta is not faster, the mapping-aware path is not
    // the regression.
    val abRoot = java.nio.file.Files.createTempDirectory("p18-nometa-")
    val src = java.nio.file.Paths.get(lake.root)
    java.nio.file.Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val dst = abRoot.resolve(rel.toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else if (!p.getFileName.toString.endsWith(".crc"))
        java.nio.file.Files.copy(p, dst) // no .crc: we edit the logs
    }
    val logDir = abRoot.resolve("_log")
    java.nio.file.Files.list(logDir).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".commit") || n.endsWith(".checkpoint")) {
        val lines = java.nio.file.Files.readAllLines(p)
        val out = new java.util.ArrayList[String]()
        lines.forEach(l => if (!l.startsWith("meta\t")) out.add(l))
        java.nio.file.Files.write(p, out)
      }
    }
    val noMeta = graft.io.Snapshot.Lake(s, abRoot.toString,
      statsCols = Seq("o_orderkey"), bloomCols = Seq("o_custkey"),
      checkpointInterval = 4)
    def runNoMeta(): Unit = (0 to 4).map { v =>
      noMeta.changes(v - 1, v)
        .groupBy(pmod(col("o_custkey"), lit(100L)).as("bucket"))
        .agg(sum(when(col("_op") === "insert", 1L).otherwise(-1L)).as("dn"))
    }.reduce(_ unionByName _).count()
    runNoMeta() // warm
    val tNoMeta = minOf(3)(runNoMeta())
    def runMeta(): Unit = (0 to 4).map { v =>
      lake.changes(v - 1, v)
        .groupBy(pmod(col("o_custkey"), lit(100L)).as("bucket"))
        .agg(sum(when(col("_op") === "insert", 1L).otherwise(-1L)).as("dn"))
    }.reduce(_ unionByName _).count()
    runMeta()
    val tMeta = minOf(3)(runMeta())
    pr(f"A/B 5-version diff fold: mapping-aware=$tMeta%.3f s  no-meta(footer path)=$tNoMeta%.3f s  loadavg=${load()}")
  }

  private def mapped(s: SparkSession): Unit = {
    for ((label, d) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1")) {
      graft.SparkEntry.queries("lake_rename")(s, d).count() // fixture
      val lake = graft.queries.ExtQueries.renameLakeForProbe(s, d)
      val head = lake.latestVersion
      val tRead = minOf(2)(lake.read().count())
      val tCdc = minOf(2)(lake.changes(-1, head).count())
      val tPrune = minOf(2) {
        lake.readRange(head, "k", 1L, 1000L).count()
      }
      pr(f"mapped@$label read=$tRead%.3f s cdcWindow=$tCdc%.3f s zonePrunedRange=$tPrune%.3f s")
    }
  }

  /** The round-18 CDF surface 1×→10×: writer-side change-file cost on
    * mutating commits (CDF on vs off — the write amplification the
    * option buys its stream with) and the CDF stream drain. */
  private def cdf(s: SparkSession): Unit = {
    import graft.io.Snapshot
    for ((label, d) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
        "sf0.1" -> "/root/testdata/sf0.1")) {
      val o = graft.Tables.orders(s, d).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .as("cents")).localCheckpoint(true)
      def build(cdfOn: Boolean): (String, Double, Double) = {
        val root = java.nio.file.Files
          .createTempDirectory(s"p18-cdf-$cdfOn-").toString
        val lake = Snapshot.Lake(s, root, statsCols = Seq("o_orderkey"),
          changeDataFeed = cdfOn)
        lake.append(o)
        val tMor = time(lake.deleteKeysMor(
          o.filter(pmod(col("o_orderkey"), lit(100L)) === 13)
            .select("o_orderkey"), "o_orderkey"))
        val tOw = time(lake.overwrite(
          o.filter(pmod(col("o_orderkey"), lit(10L)) < 9)))
        (root, tMor, tOw)
      }
      val (rootOn, mOn, wOn) = build(cdfOn = true)
      val (_, mOff, wOff) = build(cdfOn = false)
      pr(f"cdf@$label morDelete on=$mOn%.2f s off=$mOff%.2f s | overwrite on=$wOn%.2f s off=$wOff%.2f s")
      // stream drain of the whole CDF history
      val name = s"p18cdf${System.nanoTime()}"
      val tDrain = time {
        val q = s.readStream.format("graft.io.v2.SnapshotStreamSource")
          .option("readChangeFeed", "true").load(rootOn)
          .writeStream.outputMode("append").format("memory")
          .queryName(name)
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory("p18-cdf-ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      pr(f"cdf@$label stream drain = $tDrain%.2f s, ${s.table(name).count()} change rows")
    }
  }

  private def dedup10x(s: SparkSession): Unit = {
    import graft.ext.Dedup
    val out = "target/probe18_corpus.parquet"
    val n0 = 5000L // sf0.1 documents
    val variants = 200 // → 1,000,000 docs
    if (!new java.io.File(out).exists()) {
      val docs = graft.Tables.documents(s, "/root/testdata/sf0.1")
        .select(col("doc_id"), col("text"))
      // variant 0 = original; variant 1 = near-dup (last 3 tokens
      // dropped — the withNearDups recipe, one true pair per base
      // doc); variants 2.. = salted + subsampled tokens (dissimilar
      // by construction, so the pair set stays union-find-sized like
      // a real mostly-unique corpus).
      val v = explode(sequence(lit(0), lit(variants - 1))).as("variant")
      val toks = split(col("text"), "\\s+")
      val big = docs.select(col("doc_id"), col("text"), v)
        .select(
          (col("doc_id") + col("variant") * (n0 * 10)).as("doc_id"),
          when(col("variant") === 0, col("text"))
            .when(col("variant") === 1,
              concat_ws(" ", slice(toks, lit(1),
                greatest(size(toks) - 3, lit(1)))))
            .otherwise(concat_ws(" ",
              concat(
                array(concat(lit("salt"), col("variant"), lit("x"),
                  col("doc_id"))),
                filter(toks, (t, i) =>
                  pmod(i + col("variant"), lit(3)) === 0))))
            .as("text"))
      big.repartition(64).write.mode("overwrite").parquet(out)
      pr(s"wrote ${variants}x corpus to $out")
    }
    val corpus = s.read.parquet(out)
    pr(s"corpus rows = ${corpus.count()}")
    var pairs: DataFrame = null
    val tPairs = time {
      pairs = Dedup.minhashPairs(corpus, col("doc_id"), col("text"),
        threshold = 0.5).localCheckpoint(true)
    }
    val nPairs = pairs.count()
    pr(f"minhashPairs on 1M docs: $tPairs%.1f s, $nPairs pairs")
    // Full 33M-edge set: above the cutover, both calls take the
    // Pregel branch — this measures CC at 8× the threshold.
    var groupsUF: DataFrame = null
    val tUF = time {
      groupsUF = Dedup.dedupGroups(pairs, col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
    }
    pr(f"dedupGroups default regime at ${nPairs} edges: $tUF%.1f s, ${groupsUF.count()} labeled nodes")
    // The REGIME SWITCH itself, measured on a <=4M-edge subset of the
    // SAME graph: default (union-find — under the cutover) vs forced
    // Pregel, label-equal and timed.
    val sub = pairs.filter(pmod(col("doc_a"), lit(9L)) === 0L)
      .localCheckpoint(true)
    val nSub = sub.count()
    var ufSub: DataFrame = null
    val tUfSub = time {
      ufSub = Dedup.dedupGroups(sub, col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
    }
    var pgSub: DataFrame = null
    val tPgSub = time {
      pgSub = Dedup.dedupGroups(sub, col("doc_a"), col("doc_b"),
        coordinatorMaxEdges = 0L).localCheckpoint(true)
    }
    val diff = ufSub.except(pgSub).count() + pgSub.except(ufSub).count()
    pr(f"regime switch at $nSub edges (cutover 4M): union-find=$tUfSub%.1f s  Pregel=$tPgSub%.1f s  label diff=$diff (must be 0)")
    // keep-best over the groups (the dedup_keep_best shape)
    val tKeep = time {
      val toks = size(split(col("text"), "\\s+")).cast("long")
      val q = corpus.select(col("doc_id"),
        least(toks.cast("double") / 100.0, lit(1.0)).as("quality"))
      val n = q.join(broadcast(groupsUF), q("doc_id") === groupsUF("node"))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("sz"),
          max_by(col("doc_id"), struct(col("quality"), -col("doc_id")))
            .as("keep"))
        .filter(col("sz") >= 2).count()
      pr(s"keep-best groups = $n")
    }
    pr(f"keep_best: $tKeep%.1f s")
  }
}
