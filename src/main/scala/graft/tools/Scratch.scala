package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    import s.implicits._
    val v8 = Seq((1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(-1f, -2f, -3f, -4f, -5f, -6f, -7f, -8f))).toDF("vec_id", "embedding")
    val b = v8.select(col("vec_id"), graft.ext.VectorOps.lshBucket(col("embedding")).as("bucket")).collect()
    println("DIM8_BUCKETS=" + b.map(r => r.getLong(0) + ":" + r.getLong(1)).mkString(","))
    val ann = graft.ext.VectorOps.lshTopK(v8, col("vec_id"), col("embedding"),
      v8.filter(col("vec_id") === 1), col("embedding"), 5).collect()
    println("DIM8_ANN=" + ann.map(r => r.getLong(0) + "@" + r.getDouble(1)).mkString(","))
    s.stop()
  }
}
