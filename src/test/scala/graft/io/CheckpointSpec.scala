package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Log checkpointing (the Delta `_last_checkpoint` semantic): every
  * Nth commit folds the replayed (file, DV, constraint, txn) state
  * into a `.checkpoint` file, and EVERY subsequent state-shaped read
  * parses checkpoint + commit suffix — O(interval) log files at any
  * history length — instead of replaying the whole log. Gates:
  *  1. checkpointed reads ≡ full replay across the whole operation mix
  *     (append/overwrite/COW/MOR/constraint/restore/vacuum/delta/CDC);
  *  2. a 100+-commit streaming-style drain's post-drain read parses
  *     O(suffix) log files (asserted on the parse counter);
  *  3. pointer loss degrades to the directory-scan fallback, never to
  *     a wrong answer.
  */
class CheckpointSpec extends SparkSpec with graft.LowStatePartitions {
  import spark.implicits._

  private def kv(lo: Long, hi: Long) =
    (lo until hi).map(k => (k, s"row$k")).toDF("k", "v")

  private def logPath(root: String) = new Path(root, "_log")
  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Full-replay ground truth, bypassing the checkpoint path. */
  private def fullReplay(root: String, asOf: Int) =
    Snapshot.replayState(
      Snapshot.readCommits(fsOf(root), logPath(root))
        .takeWhile(_.version <= asOf))

  private def stateKey(s: Seq[(Snapshot.FileStat, Option[String])]) =
    s.map { case (f, dv) => (f.path, f.rows, f.lo.toSeq.sorted,
      f.hi.toSeq.sorted, dv) }.sortBy(_._1)

  test("checkpointed lake ≡ full replay across the whole operation mix") {
    val lake = Snapshot.Lake(spark,
      Files.createTempDirectory("ckpt-eq-").toString,
      statsCols = Seq("k"), checkpointInterval = 4)
    lake.append(kv(0, 100)) // v0
    lake.append(kv(100, 130)) // v1
    lake.addConstraint("k_nonneg", "k >= 0") // v2
    lake.upsert(Seq((5L, "upd5"), (500L, "new500")).toDF("k", "v"),
      "k") // v3
    lake.overwrite(lake.read().filter(col("k") % 7 =!= 0)) // v4 → ckpt
    lake.append(kv(700, 720)) // v5
    lake.deleteKeysMor(Seq(8L, 701L).toDF("k"), "k") // v6
    lake.upsertMor(Seq((9L, "mor9"), (800L, "mor800")).toDF("k", "v"),
      "k") // v7
    lake.appendIdempotent(kv(900, 910), "wA", 3L) // v8 → ckpt
    lake.restore(5) // v9
    lake.append(kv(950, 960)) // v10
    val lv = lake.latestVersion
    assert(lv === 10)
    // checkpoints exist where the interval says they must
    val fs = fsOf(lake.root)
    assert(fs.exists(new Path(logPath(lake.root), "00000004.checkpoint")))
    assert(fs.exists(new Path(logPath(lake.root), "00000008.checkpoint")))
    assert(fs.exists(new Path(logPath(lake.root), "_last_checkpoint")))
    // 1) liveState at EVERY version (below, at, and above checkpoints)
    //    equals the full replay — stats, DV pointers, order-free.
    (0 to lv).foreach { v =>
      assert(stateKey(lake.liveState(v)) === stateKey(fullReplay(lake.root, v)),
        s"liveState($v) diverged from full replay")
    }
    // 2) row-level reads across the checkpoint boundary
    assert(lake.readAsOf(4).count() ===
      spark.read.parquet(fullReplay(lake.root, 4).map(e =>
        s"${lake.root}/${e._1.path}"): _*).count())
    // 3) delta + CDC windows spanning a checkpoint
    val d = lake.readDelta(3, 8).select("k").collect().map(_.getLong(0)).sorted
    assert(d.nonEmpty)
    assert(lake.changes(3, 8).count() > 0)
    // 4) constraints + txn high-water replay through the checkpoint
    assert(lake.constraints === Seq(("k_nonneg", "k >= 0")))
    assert(lake.lastTxn("wA") === 3L)
    assert(lake.lastTxn("nobody") === -1L)
    // 5) a replayed append is still recognized (exactly-once survives
    //    the checkpointed txn path)
    assert(lake.appendIdempotent(kv(999, 1000), "wA", 3L) === None)
    // 6) vacuum + post-vacuum reads stay whole
    lake.vacuum(keepSnapshots = 3)
    assert(stateKey(lake.liveState(lv)) === stateKey(fullReplay(lake.root, lv)))
    assert(lake.read().count() === lake.readAsOf(lv).count())
  }

  test("post-drain reads parse O(suffix) log files, not O(versions)") {
    val lake = Snapshot.Lake(spark,
      Files.createTempDirectory("ckpt-drain-").toString,
      statsCols = Seq("k"), checkpointInterval = 10)
    // Mode-K-style drain: 104 exactly-once micro-batch appends.
    (0 until 104).foreach { b =>
      lake.appendIdempotent(kv(b * 10L, b * 10L + 10L), "stream", b.toLong)
    }
    assert(lake.latestVersion === 103)
    // A fresh handle's latest read: the version listing costs zero
    // parses; the state fold costs ONE checkpoint + the ≤interval-1
    // commit suffix (+1 for the pointer's double-parse tolerance).
    val reopened = Snapshot.Lake(spark, lake.root,
      statsCols = Seq("k"), checkpointInterval = 10)
    Snapshot.logFilesParsed.set(0L)
    assert(reopened.latestVersion === 103)
    assert(Snapshot.logFilesParsed.get() === 0L,
      "latestVersion must parse no log files")
    Snapshot.logFilesParsed.set(0L)
    assert(reopened.read().count() === 1040)
    val parsed = Snapshot.logFilesParsed.get()
    assert(parsed <= 12L,
      s"post-drain read parsed $parsed log files; " +
        "checkpoint + suffix must bound this at ~interval, not 104")
    // The exactly-once probe rides the same bounded path.
    Snapshot.logFilesParsed.set(0L)
    assert(reopened.lastTxn("stream") === 103L)
    assert(Snapshot.logFilesParsed.get() <= 12L)
    // Time travel BELOW the first checkpoint parses only commits ≤ v.
    Snapshot.logFilesParsed.set(0L)
    assert(reopened.readAsOf(5).count() === 60)
    assert(Snapshot.logFilesParsed.get() <= 7L,
      "pre-checkpoint time travel must parse only commits ≤ asOf")
    // An incremental micro-batch plan parses only its window.
    Snapshot.logFilesParsed.set(0L)
    assert(reopened.readDelta(100, 103).count() === 30)
    assert(Snapshot.logFilesParsed.get() <= 4L)
  }

  test("pointer loss falls back to directory scan; zero-interval disables") {
    val lake = Snapshot.Lake(spark,
      Files.createTempDirectory("ckpt-ptr-").toString,
      statsCols = Seq("k"), checkpointInterval = 5)
    (0 until 12).foreach(i => lake.append(kv(i * 10L, i * 10L + 10L)))
    val fs = fsOf(lake.root)
    // Simulate a crash between checkpoint publish and pointer move.
    fs.delete(new Path(logPath(lake.root), "_last_checkpoint"), false)
    assert(lake.read().count() === 120)
    Snapshot.logFilesParsed.set(0L)
    assert(lake.readAsOf(11).count() === 120)
    assert(Snapshot.logFilesParsed.get() <= 5L,
      "directory-scan fallback must still find the v10 checkpoint")
    // checkpointInterval = 0: never checkpoints, still correct.
    val plain = Snapshot.Lake(spark,
      Files.createTempDirectory("ckpt-off-").toString,
      statsCols = Seq("k"), checkpointInterval = 0)
    (0 until 12).foreach(i => plain.append(kv(i * 10L, i * 10L + 10L)))
    assert(!fsOf(plain.root).globStatus(
      new Path(logPath(plain.root), "*.checkpoint")).nonEmpty)
    assert(plain.read().count() === 120)
  }
}
