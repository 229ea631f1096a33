package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      System.err.println(f"[scr] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = graft.Tables.documents(s, d).select(col("doc_id"), col("text"))
    // 1. plan: does the kernel appear twice (filter + project)?
    val sigs = graft.ext.Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
    val plan = sigs.queryExecution.executedPlan.toString
    val n = "minhash_sig_tokens".r.findAllIn(plan).length
    System.err.println(s"[scr] kernel occurrences in plan: $n")
    System.err.println(plan.split("\n").take(12).mkString("\n"))
    // 2. same-session A/B: old explode+agg vs new kernel
    import graft.ext.{Dedup, TextOps}
    def oldSigs(dd: DataFrame): DataFrame = {
      val hv = Dedup.shingleRows(Dedup.rebalance(dd), col("doc_id"), col("text"), 3)
        .select(col("doc"), graft.ext.expr.MinhashDigests.hashes(col("s")).as("hv"))
      val mins = (0 until Dedup.NumHashes).map { k =>
        min(element_at(col("hv"), k + 1)).as(s"h$k") }
      hv.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
        .select(col("doc"), array((0 until Dedup.NumHashes).map(k => col(s"h$k")): _*).as("sig"))
    }
    def newPrefilter(dd: DataFrame): DataFrame = Dedup.rebalance(dd)
      .select(col("doc_id").as("doc"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc"), graft.ext.expr.MinhashSigTokens.of(col("toks"), 3).as("sig"))
    (1 to 2).foreach { pass =>
      val tag = if (pass == 1) "warm" else "timed"
      time(s"[$tag] old explode+agg sigs") { noop(oldSigs(docs)) }
      time(s"[$tag] new kernel sigs (isNotNull)") { noop(sigs) }
      time(s"[$tag] new kernel sigs (size prefilter)") { noop(newPrefilter(docs)) }
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val p2 = newPrefilter(docs).queryExecution.executedPlan.toString
    System.err.println(s"[scr] prefilter kernel occurrences: " +
      "minhash_sig_tokens".r.findAllIn(p2).length)
    s.stop()
  }
}
