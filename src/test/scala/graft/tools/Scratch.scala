package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * round-10 ann_recall hit-count diagnostics. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    import graft.ext.VectorOps
    def pr(msg: String): Unit = System.err.println(s"[probe] $msg")

    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val k = 10; val nQ = 5
      val emb = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val base = emb.select(col("vec_id"), col("embedding").as("v"))
      val cents = VectorOps.ivfFlatRouting(base)
      val qcorpus = emb.select(col("vec_id"), VectorOps.quantize1000(
          col("embedding").cast("array<double>")).as("q"))
        .localCheckpoint(true)
      val (cb0, codes0) = VectorOps.pqIndex(qcorpus)
      val cb = cb0.localCheckpoint(true)
      val codes = codes0.localCheckpoint(true)
      val qvecs = emb.filter(col("vec_id") < nQ)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      for ((qid, qv) <- qvecs) {
        val ex = VectorOps.bruteForceTopK(emb, col("vec_id"), col("embedding"),
          emb.filter(col("vec_id") === qid), col("embedding"), k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val iv = VectorOps.ivfFlatTopKRouted(base, cents, qv, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val pq = VectorOps.pqAdcTopK(qcorpus, cb, codes,
          qcorpus.filter(col("vec_id") === qid), k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        pr(s"$d q=$qid ivf_hits=${(ex & iv).size} pq_hits=${(ex & pq).size}" +
          s" ex=${ex.toSeq.sorted.mkString(",")}" +
          s" iv=${iv.toSeq.sorted.mkString(",")}" +
          s" pq=${pq.toSeq.sorted.mkString(",")}")
      }
    }
    s.stop()
  }
}
