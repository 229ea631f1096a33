package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A document message on the ingest stream. */
case class DocMsg(event_time: Timestamp, doc_id: Long, text: String)

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) = Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")

  private val evalText = "the held out benchmark passage nobody may train on"

  private def evalFps = Seq(evalText).toDF("text")
    .select(graft.ext.TextOps.contentFingerprint(col("text")).as("fp"))

  test("stream curation ≡ batch on the same docs; each stage really fires") {
    val ms = MemoryStream[DocMsg](spark)
    val out = Curate.curate(ms.toDF(), evalFps, "10 seconds")
    val name = s"curated${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    val batch1 = Seq(
      DocMsg(t(0), 1L, "alpha beta gamma delta epsilon zeta eta theta"),
      DocMsg(t(1), 2L, "too short"), // quality drop (< 5 words)
      DocMsg(t(2), 3L, "one two three four five six seven unique doc"),
      DocMsg(t(3), 4L, evalText)) // decontamination drop
    val batch2 = Seq(
      // retry of doc 1 under a new id — exact content dup, dropped
      DocMsg(t(4), 5L, "alpha beta gamma delta epsilon zeta eta theta"),
      // cross-batch retry of doc 3 — dropped by the fingerprint state
      DocMsg(t(5), 6L, "one two three four five six seven unique doc"),
      DocMsg(t(6), 7L, "contact me at john.doe@example.com for the real data dump"),
      DocMsg(t(7), 8L, "fresh content nine ten eleven twelve thirteen"))
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).select("doc_id", "text", "fp")

    // batch replica over the SAME rows — set equality on fingerprints
    // (the kept representative's doc_id may legitimately differ)
    val all = (batch1 ++ batch2).toDF()
    val batch = Curate.curateBatch(all, evalFps)
    val sFps = streamed.select("fp").as[String].collect().sorted.toSeq
    val bFps = batch.select("fp").as[String].collect().sorted.toSeq
    assert(sFps == bFps, s"stream $sFps != batch $bFps")

    // stage-of-death accounting: 8 in, 4 out
    assert(streamed.count() == 4, streamed.collect().mkString("\n"))
    val texts = streamed.select("text").as[String].collect().toSet
    assert(!texts.exists(_.contains("too short")), "quality filter missed")
    assert(!texts.contains(evalText), "decontamination missed")
    // the PII doc survived but scrubbed — no raw email downstream
    assert(texts.exists(_.contains("<EMAIL>")))
    assert(!texts.exists(_.contains("john.doe@example.com")))
    // exactly one copy of the retried content
    assert(streamed.filter(col("text").startsWith("alpha beta")).count() == 1)
  }

  test("scrub-before-fingerprint: docs differing only in PII spans dedup to one") {
    val ms = MemoryStream[DocMsg](spark)
    val out = Curate.curate(ms.toDF(), evalFps, "10 seconds")
    val name = s"curated${System.nanoTime()}"
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      ms.addData(Seq(
        DocMsg(t(0), 1L, "please write to alice@corp.example about the delivery today"),
        DocMsg(t(1), 2L, "please write to bob@other.example about the delivery today")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
    // both scrub to the identical text → one fingerprint survives
    assert(rows.count() == 1, rows.collect().mkString("\n"))
    assert(rows.select("text").as[String].head().contains("<EMAIL>"))
  }
}
