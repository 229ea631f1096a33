package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextOps}

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: round-8 10× scale probe for SCALE.md — substring_dedup
  * window-hash throughput under heavy cross-doc duplication. */
object Scratch {

  private def timeMin2(body: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  /** The substring_dedup shape (ExtQueries) parameterized by corpus. */
  private def subdup(docs: DataFrame): DataFrame = {
    val wins = Dedup.rebalance(docs).select(col("doc_id"),
        explode(graft.ext.expr.ShingleMd5.shingleMd5(
          TextOps.tokens(lower(col("text"))), 8)).as("h"))
      .localCheckpoint(true)
    val hc = wins.groupBy(col("h")).agg(count(lit(1)).as("n"))
    wins.join(hc, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_windows"))
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"

    // 10× corpus: id-offset replicas WITHOUT text perturbation — the
    // adversarial case for this operator: every window recurs ~10×,
    // so per-hash counts are maximal and the count join moves every
    // row. (A replica suffix would only change the final window.)
    val base = Tables.documents(s, sf)
    def corpusX(reps: Int): DataFrame = (0 until reps).map { k =>
      base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)

    for ((label, reps) <- Seq("1x" -> 1, "10x" -> 10)) {
      val c = corpusX(reps)
      val wins = Dedup.rebalance(c).select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(lower(col("text"))), 8)).as("win"))
        .select(col("doc_id"), Dedup.md5Hash60(col("win")).as("h"))
      val (tw, nw) = timeMin2(wins.count())
      val (ta, na) = timeMin2(wins.groupBy(col("h"))
        .agg(count(lit(1)).as("n")).count())
      val (t, n) = timeMin2(subdup(c).count())
      System.err.println(f"[probe] substring_dedup $label: explode+md5=$tw%6.2fs ($nw wins) +agg=$ta%6.2fs ($na hashes) full=$t%6.2fs docs=$n")
    }
    s.stop()
  }
}
