package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * corpus_pipeline stage-4 pair-set diagnostics. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val st = graft.ext.CorpusPipeline.build(
      graft.Tables.documents(s, "/root/testdata/sf0.01"))
    val pairs = graft.ext.Dedup.minhashPairs(st.afterExactDedup,
      col("doc_id"), col("text"), threshold = 0.5)
    pairs.select(col("doc_a"), col("doc_b"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_pairs")
    st.afterExactDedup.filter(col("doc_id") >= 7000000000L).select(col("doc_id"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_s3")
    s.stop()
  }
}
