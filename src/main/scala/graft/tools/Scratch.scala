package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch") // extensions via spark.sql.extensions class name
    val e = graft.Tables.events(s, "/root/testdata/sf0.01")
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    val windowForm = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val opt = windowForm.queryExecution.optimizedPlan.toString
    println("PROBE rewritten=" + (!opt.contains("row_number") && opt.contains("max_by")))
    // equivalence against a session WITHOUT the rule
    val plain = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("plain")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "")
      .getOrCreate()
    val a = windowForm.collect().map(_.toString).sorted
    println("PROBE rows=" + a.length)
    s.stop()
  }
}
