package graft.tools

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def t(name: String)(f: => Long): Unit = {
      clear()
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    s.range(1000000L).selectExpr("sum(id)").collect()
    def docs = graft.queries.ExtQueries.withNearDups(
      s.read.parquet("/tmp/sf1x/documents.parquet"))
    t("sig_10x")(Dedup.minhashSignatures(docs, col("doc_id"), col("text")).count())
    t("pairs_10x")(Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.5).count())
    t("pairs_10x_warm")(Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.5).count())
    t("groups_10x") {
      val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.5)
      Dedup.dedupGroups(pairs, col("doc_a"), col("doc_b")).count()
    }
    t("simhash_10x") {
      val sh = Dedup.simhash(docs, col("doc_id"), col("text"))
      val a = sh.select(col("doc").as("doc_a"), col("simhash").as("sh_a"))
      val b = sh.select(col("doc").as("doc_b"), col("simhash").as("sh_b"))
      a.join(b, col("doc_b") === col("doc_a") + graft.queries.ExtQueries.NearDupOffset)
        .filter(Dedup.hamming(col("sh_a"), col("sh_b")) <= 16).count()
    }
    s.stop()
  }
}
