package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val sf = "/root/testdata/sf0.1"
    val li = graft.Tables.lineitem(s, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")

    val custom = graft.plans.TopKPerKey.perKey(li,
      keys = Seq(col("l_suppkey")),
      order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
      k = 3)
    println("=== PLAN ===")
    println(custom.queryExecution.executedPlan.toString)

    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowForm = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")

    var t0 = System.nanoTime()
    val a = custom.collect().map(_.toString).sorted
    val tCustom = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val b = windowForm.collect().map(_.toString).sorted
    val tWindow = (System.nanoTime() - t0) / 1e9
    println(f"PROBE grouped_topk rows=${a.length} equal=${a.sameElements(b)} " +
      f"custom=$tCustom%.2fs window=$tWindow%.2fs")
    s.stop()
  }
}
