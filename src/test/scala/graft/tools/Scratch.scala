package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup

/** Dev scratchpad (see .claude/skills/verify) — transient. Current:
  * link_rank iteration-materialization strategy comparison. */
object Scratch {

  private def timeMin2(body: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  def rank(s: org.apache.spark.sql.SparkSession, d: String,
      checkpointEach: Boolean): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = Tables.documents(s, d).agg(count(lit(1)).cast("long").as("n"))
    val edges = docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(array((1 to 3).map(k =>
          Dedup.md5Hash60(concat(col("doc_id").cast("string"), lit(s":$k")))
            % col("n")): _*)).as("dst"))
      .localCheckpoint(true)
    var ranks = docs.crossJoin(broadcast(n))
      .selectExpr("doc_id", "1000000 div n AS r")
    for (_ <- 1 to 5) {
      val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
        .groupBy(col("dst")).agg(sum(expr("r div 3")).as("cs"))
      val next = docs.crossJoin(broadcast(n))
        .join(contrib, col("doc_id") === col("dst"), "left")
        .selectExpr("doc_id", "n",
          "150000 div n + (85 * coalesce(cs, 0)) div 100 AS r")
        .select(col("doc_id"), col("r"))
      ranks = if (checkpointEach) next.localCheckpoint(true) else next
    }
    ranks.select(col("doc_id"), col("r").as("rank_x1e6"))
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    for ((label, ck) <- Seq("checkpoint-each" -> true, "nested-plan" -> false)) {
      val (t, n) = timeMin2(rank(s, sf, ck).count())
      val chk = rank(s, sf, ck).agg(sum("rank_x1e6")).head().getLong(0)
      System.err.println(f"[probe] link_rank $label: $t%6.2fs rows=$n sum=$chk")
    }
    s.stop()
  }
}
