package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, VectorOps}

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: round-8 10× scale probes for SCALE.md — semdedup cluster
  * cap, pq_codes encode throughput, fuzzy_match block distribution. */
object Scratch {

  private def timeMin2(body: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"

    // ---- semdedup: 10× corpus (20k vectors) — cap engages ----------
    val base = Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    def corpusX(reps: Int): DataFrame = (0 until reps).map { k =>
      base.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
        transform(col("e"), x => x + lit(0.0001 * k)).as("e"))
    }.reduce(_ unionByName _)
      .select(col("vec_id"), VectorOps.quantize1000(col("e")).as("q"))
      .localCheckpoint(true)
    val c1 = corpusX(1)
    val c10 = corpusX(10)
    // cluster-size distribution of the 10× corpus (re-derives the
    // assignment stage with the same public helpers)
    val anchors = c10.withColumn("h", Dedup.md5Hash60(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select(col("vec_id").as("anchor_id"), col("q").as("aq"))
    val sizes = c10.crossJoin(broadcast(anchors))
      .select(col("vec_id"), col("anchor_id"),
        VectorOps.idist2(col("q"), col("aq")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("anchor_id"), struct(col("d2"), col("anchor_id"))).as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("nmax"),
        sum(col("n") * (col("n") - 1) / 2).as("uncapped_pairs"),
        sum(ceil(col("n") / lit(Dedup.MaxSemCluster)).cast("long") *
          (ceil(col("n") / ceil(col("n") / lit(Dedup.MaxSemCluster))).cast("long") *
           (ceil(col("n") / ceil(col("n") / lit(Dedup.MaxSemCluster))).cast("long") - 1) / 2))
          .as("capped_pairs_approx"))
      .head()
    System.err.println(s"[probe] semdedup 10x clusters: nmax=${sizes.get(0)} " +
      s"uncapped_pairs=${sizes.get(1)} capped_pairs~=${sizes.get(2)}")
    for ((label, c) <- Seq("1x" -> c1, "10x" -> c10)) {
      val (t, n) = timeMin2(Dedup.semanticDrops(c).count())
      System.err.println(f"[probe] semdedup $label: $t%6.2fs drops=$n")
    }
    val (tUncap, nUncap) = timeMin2(Dedup.semanticDrops(c10, cap = Int.MaxValue).count())
    System.err.println(f"[probe] semdedup 10x UNCAPPED: $tUncap%6.2fs drops=$nUncap")

    // ---- pq_codes: encode throughput at 10× ------------------------
    for ((label, c) <- Seq("1x" -> c1, "10x" -> c10)) {
      val (t, n) = timeMin2(VectorOps.pqEncode(c).count())
      System.err.println(f"[probe] pq_encode $label: $t%6.2fs rows=$n")
    }

    // ---- fuzzy_match: block distribution at 10× --------------------
    def pool(reps: Int): DataFrame = {
      val b = (0 until reps).map { k =>
        Tables.customer(s, sf).select(
          (col("c_custkey") + lit(k * 10000000L)).as("id"),
          concat(lit("Customer#"),
            lpad((col("c_custkey") + lit(k * 10000000L)).cast("string"), 9, "0"))
            .as("name"))
      }.reduce(_ unionByName _)
      val synth = b.select((col("id") + 1000000000L).as("id"),
        concat(substring(col("name"), 1, 10), lit("X"),
          expr("substring(name, 12)")).as("name"))
      b.unionByName(synth)
        .withColumn("blk", expr("substring(name, length(name) - 3, 4)"))
        .localCheckpoint(true)
    }
    for ((label, reps) <- Seq("1x" -> 1, "10x" -> 10)) {
      val p = pool(reps)
      val dist = p.groupBy(col("blk")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("nmax"), avg(col("n")).as("navg"),
          sum(col("n") * (col("n") - 1) / 2).as("pairs")).head()
      val a = p.select(col("blk"), col("id").as("id_a"), col("name").as("name_a"))
      val b2 = p.select(col("blk"), col("id").as("id_b"), col("name").as("name_b"))
      val (t, n) = timeMin2(
        a.join(b2, Seq("blk")).filter(col("id_a") < col("id_b"))
          .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
          .filter(col("lev") <= 2).count())
      System.err.println(f"[probe] fuzzy $label: $t%6.2fs matches=$n " +
        f"blkmax=${dist.get(0)} blkavg=${dist.get(1)} cand_pairs=${dist.get(2)}")
    }
    s.stop()
  }
}
