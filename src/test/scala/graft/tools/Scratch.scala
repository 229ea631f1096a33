package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{GapFill, Trend}

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: 10× events probe for the round-5 analytics operators
  * (SCALE.md methodology: replica k offsets user_id by 1500·k, ts
  * unchanged — 10× keys and 10× rows over the same 30-day span). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    val out = "/tmp/sf1x_events"
    if (!new java.io.File(out).exists()) {
      val e = s.read.parquet(s"$sf/events.parquet")
      (0 until 10).map { k =>
        e.select(col("event_id") + lit(1000000L * k) as "event_id",
          col("ts"), col("user_id") + lit(1500L * k) as "user_id",
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(out)
    }
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(name: String)(f: => Long): Unit = {
      clear()
      val t0 = System.nanoTime(); val n = f
      System.err.println(
        f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))

    val e1 = s.read.parquet(s"$sf/events.parquet")
    val e10 = s.read.parquet(out)
    val H = 3600L * Tables.MicrosPerSecond
    def gap(d: DataFrame) =
      GapFill.hourlyFill(d, Seq(col("user_id")), Tables.tsUs, col("value"), H)
    def trend(d: DataFrame) = Trend.slope(d, Seq(col("user_id")),
      expr("(ts div 1000 - 1704067200000000) div 60000000"),
      floor(col("value") * 100 + lit(0.5)).cast("long"))
    def zscore(d: DataFrame) = {
      val dec = "decimal(38,0)"
      val y = floor(col("value") * 100 + lit(0.5)).cast("long")
      val ee = d.select(col("event_id"), col("event_type"), col("value"), y.as("y"))
      val st = ee.groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(col("y").cast(dec)).as("sm"), sum((col("y") * col("y")).cast(dec)).as("q"))
      val dev = col("n").cast(dec) * col("y").cast(dec) - col("sm")
      ee.join(broadcast(st), "event_type")
        .filter(dev * dev > lit(9) * (col("n").cast(dec) * col("q") - col("sm") * col("sm")))
    }
    def cohort(d: DataFrame) = {
      val wk = expr("(ts div 1000 - 1704067200000000) div 604800000000")
      val uw = d.select(col("user_id"), wk.as("week")).distinct()
      uw.withColumn("cw", min(col("week")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
        .groupBy(col("cw"), (col("week") - col("cw")).as("off"))
        .agg(count(lit(1)).as("n"))
    }
    def ewma(d: DataFrame) = {
      import s.implicits._
      d.select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val sorted = it.toVector.sortBy(r => (r._2, r._3))
          var acc = sorted.head._4
          sorted.tail.foreach(r => acc = 0.9 * acc + 0.1 * r._4)
          (k, acc)
        }.toDF("user_id", "ewma")
    }
    def hier(d: DataFrame) = {
      val keys = d.select(col("o_orderkey").as("node"))
      val cand = keys.select(col("node"),
        org.apache.spark.sql.functions.when(col("node") >= 10,
          expr("node div 10")).as("cand"))
      val edges = cand.join(keys.select(col("node").as("p")),
        col("cand") === col("p"), "left")
        .select(col("node"), col("p").as("parent"))
      graft.ops.Hierarchy.rootAndDepth(edges)
    }
    val o1 = s.read.parquet(s"$sf/orders.parquet")
    // parquet, not localCheckpoint: clear() between timings unpersists
    // every RDD, which would evict checkpoint blocks mid-probe.
    val oOut = "/tmp/sf1x_orders"
    if (!new java.io.File(oOut).exists()) {
      (0 until 10).map(k => o1.select(
        (col("o_orderkey") + lit(10000000L * k)).as("o_orderkey")))
        .reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(oOut)
    }
    val o10 = s.read.parquet(oOut)
    System.err.println(s"[probe] exchanges: gap=${exchanges(gap(e10))} " +
      s"trend=${exchanges(trend(e10))} zscore=${exchanges(zscore(e10))} " +
      s"cohort=${exchanges(cohort(e10))}")
    for (r <- 1 to 2) {
      time(s"gap_fill 1x r$r")(gap(e1).count())
      time(s"gap_fill 10x r$r")(gap(e10).count())
      time(s"trend 1x r$r")(trend(e1).count())
      time(s"trend 10x r$r")(trend(e10).count())
      time(s"zscore 1x r$r")(zscore(e1).count())
      time(s"zscore 10x r$r")(zscore(e10).count())
      time(s"cohort 1x r$r")(cohort(e1).count())
      time(s"cohort 10x r$r")(cohort(e10).count())
      time(s"ewma 1x r$r")(ewma(e1).count())
      time(s"ewma 10x r$r")(ewma(e10).count())
      time(s"hier 1x r$r")(hier(o1).count())
      time(s"hier 10x r$r")(hier(o10).count())
    }
    s.stop()
  }
}
