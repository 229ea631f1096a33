package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for lake tables (the OPTIMIZE half of lake
  * maintenance; [[graft.ext.ZOrder.clusterWrite]] is the CLUSTER half,
  * [[graft.ops.Retention.dropExpiredPartitions]] the retention half).
  *
  * Streaming sinks and incremental batch appends (stream/Pipeline's
  * foreachBatch → LakeSink.append) accumulate one file per trigger per
  * partition — at 100 TB that is millions of KB-sized files, and scan
  * cost becomes file-open latency instead of IO. Compaction bin-packs
  * each partition-leaf directory back to `targetBytes`-sized files.
  *
  * Design points:
  *  - Per-leaf, not per-table: each leaf rewrite reads/writes only that
  *    partition, so a 100 TB table compacts incrementally and a failure
  *    mid-run leaves every untouched partition intact.
  *  - The rewrite is read → write to a hidden `.compact-tmp` subdir →
  *    move in → delete originals. Readers listing the leaf mid-swap see
  *    either the old files or the new ones plus leftover olds (parquet
  *    re-listing is eventually consistent with at-least-once sinks —
  *    same contract as LakeSink.append); the swap never leaves ZERO
  *    data files, and a crash between the two steps leaves duplicates
  *    (cleaned by the next compaction run), never loss.
  *  - Idempotent: a second run finds every leaf already at or below its
  *    bin-packed file count and rewrites nothing.
  */
object Compact {

  /** @return (leaf dirs rewritten, files before, files after) */
  case class Stats(dirsCompacted: Int, filesBefore: Int, filesAfter: Int)

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith(".") && !n.startsWith("_")
  }

  /** Leaf directories (no sub-directories except hidden) under root. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val entries = fs.listStatus(root).filterNot(_.getPath.getName.startsWith("."))
    val subDirs = entries.filter(_.isDirectory).map(_.getPath)
    if (subDirs.isEmpty) Seq(root)
    else subDirs.toSeq.flatMap(leafDirs(fs, _))
  }

  /** Bin-pack every partition leaf under `root` whose data-file count
    * exceeds ceil(leafBytes / targetBytes). */
  def binPack(spark: SparkSession, root: String, targetBytes: Long): Stats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var dirs = 0; var before = 0; var after = 0
    leafDirs(fs, rootPath).foreach { leaf =>
      val files = fs.listStatus(leaf)
        .filter(s => s.isFile && isDataFile(s.getPath))
      val bytes = files.map(_.getLen).sum
      val desired = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      before += files.length
      if (files.length > desired) {
        // Plan the read BEFORE writing the tmp dir: the file index lists
        // the leaf at read() time, so the rewrite never reads itself.
        val df = spark.read.parquet(leaf.toString)
        val tmp = new Path(leaf, ".compact-tmp")
        df.coalesce(desired).write.mode("overwrite").parquet(tmp.toString)
        val newFiles = fs.listStatus(tmp)
          .filter(s => s.isFile && isDataFile(s.getPath)).map(_.getPath)
        // Rename in first, delete originals second: a reader (or a
        // crash) between the steps sees new+old — duplicates under the
        // at-least-once contract — never an empty leaf.
        newFiles.zipWithIndex.foreach { case (f, i) =>
          fs.rename(f, new Path(leaf, s"part-compact-$i-${f.getName.stripPrefix("part-")}"))
        }
        files.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
        dirs += 1
        after += newFiles.length
      } else after += files.length
    }
    Stats(dirs, before, after)
  }

  /** ClusterBy-aware compaction over a [[Snapshot.Lake]] (round 14 —
    * zonemap_prune's lesson wired into the sink): rewrite the live
    * data as ONE overwrite commit whose `nFiles` files are laid in
    * `column` range order (repartitionByRange's sampled equi-depth
    * bounds + an in-file sort), so the commit's per-file zone maps
    * become near-DISJOINT ranges and [[Snapshot.Lake.pruneFiles]]
    * answers a range predicate with ~selectivity × nFiles files —
    * against a round-robin layout where every file intersects every
    * range (CompactSpec's pruning experiment, the ZOrderSpec 16-file
    * sweep shape). The rewrite rides the snapshot commit protocol, so
    * readers time-traveling to pre-compact versions still see the old
    * layout, and a crash mid-compact publishes nothing.
    *
    * At 100 TB: ONE range exchange over the table — the same cost
    * OPTIMIZE ... ZORDER pays — bought back by every later range scan;
    * run it per partition-leaf in production (the binPack granularity
    * argument) rather than table-wide. */
  def clusterBy(lake: Snapshot.Lake, column: String, nFiles: Int): Int = {
    import org.apache.spark.sql.functions.col
    lake.overwrite(
      lake.read().repartitionByRange(nFiles, col(column))
        .sortWithinPartitions(column))
  }

  /** Z-ORDER compact over a [[Snapshot.Lake]] (the 2-D half of
    * OPTIMIZE — Delta/Iceberg ZORDER BY): rewrite the live data as ONE
    * overwrite commit laid in Morton-key range order over (x, y), so
    * every file's zone map is a tight bounding BOX on BOTH columns and
    * [[Snapshot.Lake.pruneFiles]] answers range predicates on EITHER
    * dimension with a small file subset — where [[clusterBy]] prunes
    * its one column perfectly and the other not at all (SnapshotSpec's
    * two-dimension experiment). Inputs are masked to 16 bits by the
    * Morton key ([[graft.ext.ZOrder.interleave16]]'s contract);
    * normalize wider domains first (rank-bucket or pmod). Same cost
    * shape as clusterBy: one range exchange over the table, bought
    * back by every later selective scan on either dimension. */
  def zOrderBy(lake: Snapshot.Lake, x: String, y: String,
      nFiles: Int): Int = {
    import org.apache.spark.sql.functions.col
    lake.overwrite(
      lake.read()
        .withColumn("__zkey",
          graft.ext.ZOrder.interleave16(col(x), col(y)))
        .repartitionByRange(nFiles, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey"))
  }
}
