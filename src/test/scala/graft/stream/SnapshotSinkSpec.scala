package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.io.Snapshot

/** Exactly-once contract of the streaming lake sink: each micro-batch
  * lands as one txn-stamped commit, a re-delivered batch is a no-op,
  * and the CDC feed over the sink's commits reads back exactly the
  * per-batch increments. */
class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches commit once; replayed batch is skipped; CDC reads the increments") {
    val lake = Snapshot.Lake(spark,
      Files.createTempDirectory("lake-sink-").toString, statsCols = Seq("k"))
    val ms = MemoryStream[Long](spark)
    val ckpt = Files.createTempDirectory("lake-sink-ckpt-").toString
    val q = SnapshotSink.attach(ms.toDF().withColumnRenamed("value", "k"),
      lake, writerId = "sensor-writer", checkpointDir = ckpt)
    try {
      ms.addData(0L until 50L: _*); q.processAllAvailable()
      ms.addData(50L until 80L: _*); q.processAllAvailable()
    } finally q.stop()

    // Two non-empty batches ⇒ two commits, both txn-stamped, rows exact.
    assert(lake.read().count() === 80)
    val txns = lake.commits.flatMap(_.txn)
    assert(txns.map(_._1).distinct === Seq("sensor-writer"))
    assert(txns.map(_._2).sorted === Seq(0L, 1L))
    assert(lake.lastTxn("sensor-writer") === 1L)

    // The at-least-once replay: re-delivering batch 1 (or 0) must be a
    // no-op — same rows, same version count, same txn high-water mark.
    val vBefore = lake.latestVersion
    assert(lake.appendIdempotent(
      (50L until 80L).toDF("k"), "sensor-writer", 1L).isEmpty)
    assert(lake.appendIdempotent(
      (0L until 50L).toDF("k"), "sensor-writer", 0L).isEmpty)
    assert(lake.latestVersion === vBefore)
    assert(lake.read().count() === 80)

    // A NEW batch from the same writer still lands…
    assert(lake.appendIdempotent(
      (80L until 90L).toDF("k"), "sensor-writer", 2L).nonEmpty)
    assert(lake.read().count() === 90)
    // …and an independent writer is tracked separately.
    assert(lake.lastTxn("other-writer") === -1L)
    assert(lake.appendIdempotent(
      (900L until 910L).toDF("k"), "other-writer", 0L).nonEmpty)
    assert(lake.read().count() === 100)

    // CDC over the sink's first two commits reads back exactly the
    // micro-batch increments (insert-only, no deletes).
    val c = lake.changes(0, 1)
    assert(c.filter("_op = 'delete'").count() === 0)
    assert(c.filter("_op = 'insert'").select("k").as[Long].collect().sorted
      .toSeq === (50L until 80L))
  }
}
