package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: round-6 10× events probe for the reworked ewma
  * (flatMapSortedGroups streaming fold) and the new
  * equidepth_hist_scale (histogram-compressed deciles), plus a
  * HOT-KEY ewma stress: all replicas map onto the SAME user ids so one
  * key's history grows 10× — the exact case the old toVector fold
  * would materialize (SCALE.md methodology: replica k offsets user_id
  * by 1500·k for the even probe, by 0 for the hot-key probe). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    def replicate(out: String, hot: Boolean): Unit =
      if (!new java.io.File(out).exists()) {
        val e = s.read.parquet(s"$sf/events.parquet")
        (0 until 10).map { k =>
          e.select(col("event_id") + lit(1000000L * k) as "event_id",
            col("ts"),
            col("user_id") + lit(if (hot) 0L else 1500L * k) as "user_id",
            col("event_type"), col("value"), col("props"))
        }.reduce(_ unionByName _).repartition(32)
          .write.mode("overwrite").parquet(out)
      }
    replicate("/tmp/sf1x_events", hot = false)
    replicate("/tmp/sf1x_events_hot", hot = true)
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
    val e1 = s.read.parquet(s"$sf/events.parquet")
    val e10 = s.read.parquet("/tmp/sf1x_events")
    val e10hot = s.read.parquet("/tmp/sf1x_events_hot")

    def ewma(d: DataFrame): DataFrame = {
      import s.implicits._
      d.select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapSortedGroups(col("tus"), col("event_id")) { (k, it) =>
          var n = 0L; var acc = 0.0
          it.foreach { r => acc = if (n == 0L) r._4 else 0.9 * acc + 0.1 * r._4; n += 1 }
          Iterator.single((k, n, acc))
        }.toDF("user_id", "n", "ewma")
    }
    def equidepth(d: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val byQ = Window.partitionBy(col("event_type")).orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byType = Window.partitionBy(col("event_type"))
      d.select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("q"))
        .groupBy(col("event_type"), col("q"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(byQ))
        .withColumn("total", sum(col("cnt")).over(byType))
        .withColumn("decile",
          least(lit(10L), lit(1L) + expr("((cum - cnt) * 10) div total")))
        .groupBy(col("event_type"), col("decile"))
        .agg(sum(col("cnt")).as("n"))
    }

    for (r <- 1 to 2) {
      time(s"ewma 1x r$r")(ewma(e1).count())
      time(s"ewma 10x r$r")(ewma(e10).count())
      time(s"ewma 10x-hotkey r$r")(ewma(e10hot).count())
      time(s"equidepth 1x r$r")(equidepth(e1).count())
      time(s"equidepth 10x r$r")(equidepth(e10).count())
    }
    s.stop()
  }
}
