package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * sf1-scale (100×-of-oracle-scale = 10×-of-sf0.1) probes for the
  * dedup family + the round-9 fuzzy_match block cap (SCALE.md rows).
  * Corpus conventions follow the round-8 probes: documents = pure
  * id-offset replicas (adversarial for window/shingle ops), embeddings
  * = id-offset replicas at +0.0001·k perturbation (true near-dups),
  * customers = id-offset replicas with generator-shaped names. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val dir = "/tmp/graft_sf1"
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = Seq(time(body), time(body)).min
    def pr(msg: String): Unit = System.err.println(s"[probe] $msg")

    // ---- generate the sf1 corpus once --------------------------------
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      (0 until 10).map(k => docs.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      (0 until 10).map(k => emb.select(
          (col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.0001f * k))
            .as("embedding"),
          col("label")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val cust = s.read.parquet("/root/testdata/sf0.1/customer.parquet")
      (0 until 10).map(k => cust.select(
          (col("c_custkey") + lit(k * 10000000L)).as("c_custkey"),
          concat(lit("Customer#"),
            lpad((col("c_custkey") + lit(k * 10000000L)).cast("string"), 9, "0"))
            .as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      pr(s"generated sf1 corpus at $dir")
    }

    // ---- wall-clock probes (noop sink, min-of-2 JIT-warm) ------------
    for (name <- Seq("dedup_corpus", "substring_dedup", "semdedup");
         (label, d) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> dir)) {
      val t = minOf2(graft.SparkEntry.queries(name)(s, d)
        .write.mode("overwrite").format("noop").save())
      pr(f"$name@$label  min=$t%.2fs")
    }

    // ---- cap-engagement diagnostics ----------------------------------
    import graft.ext.{Dedup, Fuzzy, VectorOps}
    import graft.queries.ExtQueries

    // dedup_corpus: LSH band-bucket occupancy + pair count + CC regime
    val docs = ExtQueries.withNearDups(graft.Tables.documents(s, dir))
    val banded = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
      .select(col("doc"), posexplode(Dedup.bandHashes(col("sig"))).as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
    val bmax = banded.agg(max(col("n"))).head().getLong(0)
    val bover = banded.filter(col("n") > Dedup.MaxBandBucket).count()
    val npairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.5).count()
    pr(s"dedup_corpus@sf1  pairs=$npairs  maxBandBucket=$bmax  " +
      s"bucketsOverCap=$bover  ccRegime=${if (npairs <= 4000000) "driver-union-find" else "GraphX-Pregel"}")

    // semdedup: cluster sizes under the 8 hash anchors; candidate
    // pairs uncapped (Σ n²/2) vs capped (Σ per-(cluster, vec_id mod
    // nsplit) bucket m²/2) — the r8 diagnostic at the new scale
    val base = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val synth = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("e"), x => x + lit(0.001)).as("e"))
    val corpus = base.unionByName(synth)
      .select(col("vec_id"), VectorOps.quantize1000(col("e")).as("q"))
      .localCheckpoint(true)
    val anchors = corpus
      .withColumn("h", Dedup.md5Hash60(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select(col("vec_id").as("anchor_id"), col("q").as("aq"))
    val assigned = corpus.crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("anchor_id"),
        VectorOps.idist2(col("q"), col("aq")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("anchor_id"), struct(col("d2"), col("anchor_id")))
        .as("cluster"))
    val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("cn"))
      .localCheckpoint(true)
    val maxCluster = sizes.agg(max(col("cn"))).head().getLong(0)
    val uncapped = sizes
      .agg(sum((col("cn") * (col("cn") - 1) / 2).cast("long")))
      .head().getLong(0)
    val cap = Dedup.MaxSemCluster
    val capped = assigned.join(broadcast(sizes), Seq("cluster"))
      .withColumn("sub", pmod(col("vec_id"),
        floor((col("cn") + lit(cap - 1).cast("long")) / lit(cap)).cast("long")))
      .groupBy(col("cluster"), col("sub")).agg(count(lit(1)).as("m"))
      .agg(sum((col("m") * (col("m") - 1) / 2).cast("long")))
      .head().getLong(0)
    pr(s"semdedup@sf1  maxCluster=$maxCluster  candPairsUncapped=$uncapped" +
      s"  candPairsCapped=$capped (cap=$cap)")

    // fuzzy_match: round-9 Fuzzy.MaxBlock probe — block occupancy at
    // this scale, identity-vs-engaged candidate pairs + wall clock
    val fbase = graft.Tables.customer(s, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val fsynth = fbase.select((col("id") + 1000000000L).as("id"),
      concat(substring(col("name"), 1, 10), lit("X"),
        expr("substring(name, 12)")).as("name"))
    val pool = fbase.unionByName(fsynth)
      .withColumn("blk", expr("substring(name, length(name) - 3, 4)"))
      .localCheckpoint(true)
    val blocks = pool.groupBy(col("blk")).agg(count(lit(1)).as("cn"))
      .localCheckpoint(true)
    val maxBlock = blocks.agg(max(col("cn"))).head().getLong(0)
    def fuzzyPairs(c: Int): Long = blocks
      .withColumn("nsplit",
        floor((col("cn") + lit(c - 1).cast("long")) / lit(c)).cast("long"))
      // sub-bucket sizes are near-even (ids are dense mod nsplit):
      // bound with ceil(cn/nsplit) per bucket
      .select((col("nsplit") *
        ceil(col("cn").cast("double") / col("nsplit")) *
        (ceil(col("cn").cast("double") / col("nsplit")) - 1) / 2)
        .cast("long").as("p"))
      .agg(sum(col("p")).cast("long")).head().getLong(0)
    for (c <- Seq(Fuzzy.MaxBlock, 30)) {
      val t = minOf2(Fuzzy.blockedMatch(pool, maxLev = 2, cap = c)
        .write.mode("overwrite").format("noop").save())
      pr(f"fuzzy_match@sf1 cap=$c  min=$t%.2fs  maxBlock=$maxBlock  " +
        f"candPairsBound=${fuzzyPairs(c)}")
    }
    s.stop()
  }
}
