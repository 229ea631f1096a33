package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad (see .claude/skills/verify) — transient. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-scratch")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val work = java.nio.file.Files.createTempDirectory("graft-scr").toString
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = graft.ext.TextOps.tokens(col("text"))
    val nears = docs0.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        concat_ws(" ",
          slice(toks, lit(1), greatest(size(toks) - 3, lit(1)))).as("text"))
    val input = docs0.unionByName(nears)
      .withColumn("event_time",
        lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
    val topic = s"$work/topic"
    input.write.mode("overwrite").parquet(topic)
    val evalFps = docs0.filter(lit(false))
      .select(graft.ext.TextOps.contentFingerprint(col("text")).as("fp"))
    val sink = s"$work/out"
    val t0 = System.nanoTime()
    val q = graft.stream.Curate.curateNearDup(
        spark.readStream.schema(input.schema).parquet(topic), evalFps)
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    System.err.println(f"[probe] wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    q.recentProgress.foreach { p =>
      System.err.println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs=${p.durationMs} stateOps=${p.stateOperators.map(s =>
          s"${s.operatorName}:rows=${s.numRowsTotal},commitMs=${s.commitTimeMs}").mkString(" | ")}")
    }
    spark.stop()
  }
}
