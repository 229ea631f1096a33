package graft.tools

import org.apache.spark.sql.functions._

/** Round-20 optimization probes (test scope — never ships): substage
  * wall times of the dedup/exact-join machinery at sf0.1, so the
  * optimization round cuts where the time actually is.
  * Usage: Test/runMain graft.tools.Probe20 [dedup|conf]
  */
object Probe20 {
  private def pr(m: String): Unit = System.err.println(s"[p20] $m")

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("dedup")
    val s = graft.GraftSession.local("graft-probe20")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      pr(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val d = "/root/testdata/sf0.1"
    if (what == "dedup") {
      import graft.ext.Dedup
      val docs = graft.queries.ExtQueries.withNearDups(graft.Tables.documents(s, d))
      // JIT warm-up pass over the whole chain, then timed substages.
      (1 to 2).foreach { pass =>
        val tag = if (pass == 1) "warm" else "timed"
        time(s"[$tag] hashedShingleSets") {
          Dedup.hashedShingleSets(docs, col("doc_id"), col("text"), 3)
            .write.mode("overwrite").format("noop").save()
        }
        val ds = Dedup.hashedShingleSets(docs, col("doc_id"),
          col("text"), 3)
        time(s"[$tag] similarityCandidates(1/2)") {
          Dedup.similarityCandidates(ds, 1, 2)
            .write.mode("overwrite").format("noop").save()
        }
        time(s"[$tag] full similarityJoin(1/2)") {
          Dedup.similarityJoin(docs, col("doc_id"), col("text"), 1, 2)
            .write.mode("overwrite").format("noop").save()
        }
        time(s"[$tag] minhashSignatures") {
          Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
            .write.mode("overwrite").format("noop").save()
        }
        val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
          .localCheckpoint(true)
        time(s"[$tag] pairsFromSignatures") {
          Dedup.pairsFromSignatures(sigs, 0.5)
            .write.mode("overwrite").format("noop").save()
        }
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    if (what == "conf") {
      // A/B: sort-merge (session default) vs shuffled-hash preference,
      // per query, min-of-2, same session. Queries chosen for their
      // shuffle-join content (exact-join family, TPC-H shapes, lake).
      val qs = Seq("dedup_threshold_sweep", "lake_cdf_history",
        "dedup_threshold_sweep", "lake_cdf_history",
        "dedup_threshold_sweep", "lake_cdf_history")
      def minOf2(body: => Unit): Double = {
        def run(): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val a = run()
        val b = run()
        math.min(a, b)
      }
      def clear(): Unit = {
        s.catalog.clearCache()
        s.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      // JIT warm-up over the set once.
      qs.foreach { q =>
        clear()
        graft.SparkEntry.queries(q)(s, d).write.mode("overwrite")
          .format("noop").save()
      }
      qs.foreach { q =>
        clear()
        s.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        s.conf.unset("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
        val smj = minOf2(graft.SparkEntry.queries(q)(s, d)
          .write.mode("overwrite").format("noop").save())
        clear()
        s.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        s.conf.set(
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        val shj = minOf2(graft.SparkEntry.queries(q)(s, d)
          .write.mode("overwrite").format("noop").save())
        pr(f"conf $q%-26s smj=$smj%5.2f s  shj=$shj%5.2f s  (${(smj - shj) / smj * 100}%+.0f%%)")
      }
    }
    s.stop()
  }
}
