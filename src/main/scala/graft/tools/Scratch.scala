package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    import s.implicits._
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("id", "v") // array<double>, not float
    try {
      bad.select(graft.ext.VectorOps.cosineFast(col("v"), col("v"))).collect()
      println("PROBE unexpected-success")
    } catch {
      case e: Exception => println("PROBE error-class=" + e.getClass.getSimpleName +
        " msg=" + e.getMessage.linesIterator.next())
    }
    // null vector: nullSafeEval path → NULL out, not crash
    val withNull = Seq((1L, Array(1f, 2f)), (2L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    val got = withNull.select(graft.ext.VectorOps.cosineFast(col("v"), col("v")).as("c")).collect()
    println("PROBE nulls=" + got.map(r => if (r.isNullAt(0)) "NULL" else r.getDouble(0).toString).mkString(","))
    s.stop()
  }
}
