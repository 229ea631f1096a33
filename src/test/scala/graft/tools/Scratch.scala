package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      System.err.println(f"[scr] $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val docs = graft.Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source")).localCheckpoint(true)
    val aug = CorpusPipeline.augment(docs)
    val s1 = aug.filter(QualityFilter.keep(col("text")))
    val canon = CorpusPipeline.pageCanon
    // A: current window form (s2 then s3)
    def winForm: DataFrame = {
      val s2 = s1.withColumn("__canon", canon)
        .withColumn("__keep", min(col("doc_id")).over(Window.partitionBy(col("__canon"))))
        .filter(col("doc_id") === col("__keep")).drop("__canon", "__keep")
      s2.withColumn("__keep",
          min(col("doc_id")).over(Window.partitionBy(lower(trim(col("text"))))))
        .filter(col("doc_id") === col("__keep")).drop("__keep")
    }
    // B: min_by aggregate form
    def aggForm: DataFrame = {
      val s2 = s1.groupBy(canon.as("__c"))
        .agg(min_by(struct(col("doc_id"), col("text"), col("source")), col("doc_id")).as("r"))
        .select(col("r.doc_id"), col("r.text"), col("r.source"))
      s2.groupBy(lower(trim(col("text"))).as("__t"))
        .agg(min_by(struct(col("doc_id"), col("text"), col("source")), col("doc_id")).as("r"))
        .select(col("r.doc_id"), col("r.text"), col("r.source"))
    }
    (1 to 3).foreach { pass =>
      time(s"[p$pass] s2+s3 window form") { noop(winForm) }
      time(s"[p$pass] s2+s3 min_by form") { noop(aggForm) }
    }
    // equality check
    val a = winForm.orderBy("doc_id").collect()
    val b = aggForm.orderBy("doc_id").collect()
    System.err.println(s"[scr] equal=${a.sameElements(b)} n=${a.length}")
    s.stop()
  }
}
