package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staged conversion funnel — the product-analytics primitive
  * (ClickHouse's windowFunnel, Amplitude/Mixpanel funnels): how many
  * users progressed view → click → purchase, and how fast.
  *
  * Semantics here are the deterministic EARLIEST-ANCHOR funnel: per
  * user, t1 = the earliest stage-1 event; t_k = the earliest stage-k
  * event strictly after t_{k-1} and within `windowUs` of t1. Every
  * step is a min — no arbitrary row choice — so the whole funnel
  * hash-oracles across engines. (ClickHouse's windowFunnel retries
  * later anchors when an early chain stalls; the earliest-anchor form
  * is the deterministic subset that needs no per-user sequential
  * scan, and underreports only users whose FIRST anchor chain failed
  * where a later one succeeded.)
  *
  * 100 TB shape: one filtered partial+final min-aggregate per stage
  * over the events scan; each later stage joins the previous stage's
  * USER-cardinality frame (dimension-sized, broadcastable) against
  * its own filtered scan. Nothing event-sized ever crosses an
  * exchange except the per-stage (user, min) combine — the classic
  * funnel layout.
  */
object Funnel {

  /** @param stages   ordered event-type names, ≥ 1
    * @param windowUs max elapsed micros from the stage-1 anchor
    * @return (stage, stage_name, n_users, avg_lag_us) — one row per
    *         stage; avg_lag_us = HALF_UP mean of (t_k − t1) over the
    *         users who reached the stage (0 for stage 1, null if none)
    */
  def staged(events: DataFrame, user: Column, tus: Column,
      eventType: Column, stages: Seq[String], windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val ev = events.select(user.as("u"), tus.as("t"), eventType.as("et"))
    var cur = ev.filter(col("et") === stages.head)
      .groupBy(col("u")).agg(min(col("t")).as("t1"))
      .withColumn("tk", col("t1"))
    val frames = Seq.newBuilder[(Int, DataFrame)]
    frames += ((1, cur))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = ev.filter(col("et") === st)
        .join(cur.select(col("u"), col("t1"), col("tk").as("tprev")), "u")
        .filter(col("t") > col("tprev") &&
          col("t") <= col("t1") + lit(windowUs))
        .groupBy(col("u"), col("t1")).agg(min(col("t")).as("tk"))
      frames += ((i + 1, cur))
    }
    frames.result().map { case (i, f) =>
      f.agg(count(lit(1)).as("n_users"),
          sum(col("tk") - col("t1")).as("sl"))
        .select(lit(i.toLong).as("stage"),
          lit(stages(i - 1)).as("stage_name"), col("n_users"),
          expr("""CASE WHEN n_users = 0 THEN NULL
                 |     ELSE (2 * sl + n_users) div (2 * n_users) END"""
            .stripMargin).as("avg_lag_us"))
    }.reduce(_ unionByName _)
  }
}
