package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-21 optimization probes (test scope — never ships): substage
  * wall times + A/B shapes for the VERDICT r20 punch list.
  * Usage: Test/runMain graft.tools.Probe21 [verify|cp|lake|uni|q <names>]
  */
object Probe21 {
  private def pr(m: String): Unit = System.err.println(s"[p21] $m")

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("verify")
    val s = graft.GraftSession.local("graft-probe21")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val sec = (System.nanoTime() - t0) / 1e9
      pr(f"$label%-40s $sec%6.2f s"); sec
    }
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    if (what == "verify") {
      import graft.ext.Dedup
      val docs = graft.queries.ExtQueries.withNearDups(
        graft.Tables.documents(s, d))
      (1 to 2).foreach { pass =>
        val tag = if (pass == 1) "warm" else "timed"
        val ds = Dedup.hashedShingleSets(docs, col("doc_id"), col("text"), 3)
        time(s"[$tag] hashedShingleSets (ckpt)") { ds.count() }
        val cand = Dedup.similarityCandidates(ds, 1, 2)
        time(s"[$tag] candidates") { noop(cand) }
        val candC = cand.localCheckpoint(true)
        pr(s"[$tag] n_cand=${candC.count()} n_docs=${ds.count()}")
        // A: current shape — two shuffle attach joins over full ds
        def attach(c: DataFrame, dsA: DataFrame, dsB: DataFrame) = c
          .join(dsA.select(col("doc").as("doc_a"), col("sh").as("sh_a"),
            col("len").as("na")), Seq("doc_a"))
          .join(dsB.select(col("doc").as("doc_b"), col("sh").as("sh_b"),
            col("len").as("nb")), Seq("doc_b"))
          .withColumn("ni",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
          .withColumn("nu", col("na") + col("nb") - col("ni"))
          .filter(col("ni") * 2 >= col("nu") * 1)
          .select(col("doc_a"), col("doc_b"),
            round(col("ni").cast("double") / col("nu"), 4).as("jaccard"))
        time(s"[$tag] verify A (shuffle attach x2)") {
          noop(attach(candC, ds, ds))
        }
        // B: semi-filter ds to candidate ids first (broadcast semi)
        val dsA2 = ds.join(broadcast(candC.select(col("doc_a").as("doc"))
          .distinct()), Seq("doc"), "left_semi")
        val dsB2 = ds.join(broadcast(candC.select(col("doc_b").as("doc"))
          .distinct()), Seq("doc"), "left_semi")
        time(s"[$tag] verify B (semi-filter, shuffle attach)") {
          noop(attach(candC, dsA2, dsB2))
        }
        // C: broadcast the filtered attach sides outright
        def attachB(c: DataFrame, dsA: DataFrame, dsB: DataFrame) = c
          .join(broadcast(dsA.select(col("doc").as("doc_a"),
            col("sh").as("sh_a"), col("len").as("na"))), Seq("doc_a"))
          .join(broadcast(dsB.select(col("doc").as("doc_b"),
            col("sh").as("sh_b"), col("len").as("nb"))), Seq("doc_b"))
          .withColumn("ni",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
          .withColumn("nu", col("na") + col("nb") - col("ni"))
          .filter(col("ni") * 2 >= col("nu") * 1)
          .select(col("doc_a"), col("doc_b"),
            round(col("ni").cast("double") / col("nu"), 4).as("jaccard"))
        time(s"[$tag] verify C (broadcast filtered attach)") {
          noop(attachB(candC, dsA2, dsB2))
        }
        // D: end-to-end current similarityJoin for reference
        time(s"[$tag] full similarityJoin (current)") {
          noop(Dedup.similarityJoin(docs, col("doc_id"), col("text"), 1, 2))
        }
        // minhash side (dedup_recall's other half)
        val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
          .localCheckpoint(true)
        time(s"[$tag] minhashSignatures (ckpt)") { sigs.count() }
        time(s"[$tag] pairsFromSignatures (current)") {
          noop(Dedup.pairsFromSignatures(sigs, 0.5))
        }
        clear()
      }
    }

    if (what == "pairs") {
      import graft.ext.Dedup
      val docs = graft.queries.ExtQueries.withNearDups(
        graft.Tables.documents(s, d))
      (1 to 2).foreach { pass =>
        val tag = if (pass == 1) "warm" else "timed"
        val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
          .localCheckpoint(true)
        time(s"[$tag] minhashSignatures (ckpt)") { sigs.count() }
        val banded = Dedup.okBandRows(sigs)
        val cand = banded.select(col("doc").as("doc_a"), col("band"),
            col("bh"))
          .join(banded.select(col("doc").as("doc_b"), col("band"),
            col("bh")), Seq("band", "bh"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"))
          .distinct()
        def verify(c: DataFrame) = c
          .select(col("doc_a"), col("doc_b"),
            Dedup.estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
          .filter(col("est_jaccard") >= 0.5)
        // A: current — shuffle attach joins
        time(s"[$tag] pairs A (shuffle attach)") {
          noop(verify(cand
            .join(sigs.select(col("doc").as("doc_a"),
              col("sig").as("sig_a")), Seq("doc_a"))
            .join(sigs.select(col("doc").as("doc_b"),
              col("sig").as("sig_b")), Seq("doc_b"))))
        }
        // B: broadcast the pair frame through both attaches
        time(s"[$tag] pairs B (broadcast attach)") {
          val withA = sigs.select(col("doc").as("doc_a"),
              col("sig").as("sig_a"))
            .join(broadcast(cand), Seq("doc_a"))
          noop(verify(sigs.select(col("doc").as("doc_b"),
              col("sig").as("sig_b"))
            .join(broadcast(withA), Seq("doc_b"))))
        }
        time(s"[$tag] pairsFromSignatures (current)") {
          noop(Dedup.pairsFromSignatures(sigs, 0.5))
        }
        clear()
      }
    }

    if (what == "cp") {
      // corpus_pipeline stage probe: time each stage frame's noop off
      // a fresh build graph (stages share upstream checkpoints, so
      // later stages time only their own increment).
      val docs = graft.Tables.documents(s, d)
      (1 to 2).foreach { pass =>
        val tag = if (pass == 1) "warm" else "timed"
        var t0 = System.nanoTime()
        val st = graft.ext.CorpusPipeline.build(docs)
        pr(f"[$tag] build() construction (ckpts run here) " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
        time(s"[$tag] s1 quality") { noop(st.afterQuality) }
        time(s"[$tag] s2 urlDedup") { noop(st.afterUrlDedup) }
        time(s"[$tag] s3 exactDedup (ckpt)") { noop(st.afterExactDedup) }
        time(s"[$tag] pairs") { noop(st.pairs) }
        time(s"[$tag] groups") { noop(st.groups) }
        time(s"[$tag] s4 nearDedup (ckpt)") { noop(st.afterNearDedup) }
        time(s"[$tag] s5 decontam") { noop(st.afterDecontam) }
        time(s"[$tag] s6 mixture") { noop(st.afterMixture) }
        time(s"[$tag] s7 packed") { noop(st.packed) }
        time(s"[$tag] packed end-to-end (fresh)") {
          noop(graft.ext.CorpusPipeline.build(docs).packed)
        }
        clear()
      }
    }

    if (what == "lake") {
      val mk = () => graft.queries.ExtQueries.queries("lake_cdf_history")(s, d)
      (1 to 2).foreach { pass =>
        val tag = if (pass == 1) "warm" else "timed"
        time(s"[$tag] lake_cdf_history") { noop(mk()) }
        clear()
      }
    }

    if (what == "q") {
      val qs = args.drop(1).toSeq
      // JIT warm-up over the set once, then min-of-2 per query.
      qs.foreach { q =>
        clear(); noop(graft.SparkEntry.queries(q)(s, d))
      }
      qs.foreach { q =>
        clear()
        val a = { val t0 = System.nanoTime()
          noop(graft.SparkEntry.queries(q)(s, d))
          (System.nanoTime() - t0) / 1e9 }
        clear()
        val b = { val t0 = System.nanoTime()
          noop(graft.SparkEntry.queries(q)(s, d))
          (System.nanoTime() - t0) / 1e9 }
        pr(f"$q%-28s min=${math.min(a, b)}%6.2f s  (runs $a%.2f/$b%.2f)")
      }
    }
    s.stop()
  }
}
