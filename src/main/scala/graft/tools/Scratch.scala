package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROBE $tag rows=$n ${(System.nanoTime - t0) / 1e9}%.2fs")
    }
    val base = graft.Tables.events(s, d).select(col("user_id"), col("event_id"),
      graft.Tables.tsUs.as("ts_us"), col("event_type"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    time("warm")(base.count())
    time("window_form")(base.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count())
    time("maxby_form")(graft.SparkEntry.queries("latest_per_key")(s, d).count())
    time("promo_revenue")(graft.SparkEntry.queries("promo_revenue")(s, d).count())
    s.stop()
  }
}
