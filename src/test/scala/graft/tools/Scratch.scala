package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      System.err.println(f"[scr] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = graft.Tables.documents(s, d)
    // old shingleShardRows: string windows + md5Hash60 per row
    def rowsOld = Dedup.shingleRows(Dedup.rebalance(docs), col("doc_id"), col("text"), 3)
      .select(col("doc"), Sampling.shard(col("doc"), 20).as("shard"),
        Dedup.md5Hash60(col("s")).as("sh"))
    def checkFrom(rows: DataFrame): DataFrame = {
      val evalSh = rows.filter(col("shard") < 2).select(col("sh")).distinct()
      val train = rows.filter(col("shard") >= 2).select(col("doc"), col("sh")).distinct()
      train.join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
        .groupBy(col("doc"))
        .agg(count(lit(1)).as("n_shingles"), sum(coalesce(col("hit"), lit(0L))).as("n_contam"))
        .select(col("doc").as("doc_id"), col("n_shingles"), col("n_contam"),
          round(col("n_contam").cast("double") / col("n_shingles"), 4).as("contam_frac"))
    }
    (1 to 3).foreach { pass =>
      time(s"[p$pass] contam_check OLD (string+md5hex)") { noop(checkFrom(rowsOld)) }
      time(s"[p$pass] contam_check NEW (ShingleMd5 kernel)") {
        noop(Contamination.check(docs, col("doc_id"), col("text")))
      }
    }
    s.stop()
  }
}
