package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten (targeted key deletion) on a partitioned lake
  * — the missing third lifecycle operator next to time-based retention
  * ([[graft.ops.Retention.dropExpiredPartitions]]: whole-directory
  * drops) and compaction ([[Compact.binPack]]): GDPR/CCPA erasure must
  * remove SPECIFIC keys, which no partition boundary aligns with, so
  * some rewrite is unavoidable — the job is to rewrite as little as
  * possible.
  *
  * Two passes:
  *   1. locate: one column-pruned scan (key + partition columns only)
  *      broadcast-SEMI-joined against the key set finds the partitions
  *      that actually contain the keys, and the global removed-row
  *      count.
  *   2. rewrite: ONLY those partition leaves are read, broadcast-ANTI-
  *      joined against the key set, and swapped in place (new files
  *      rename in FIRST, then the originals are deleted: readers
  *      listing mid-swap see old or new+old — at-least-once, never
  *      zero files; a crash between the two steps leaves duplicates,
  *      never loss). Every untouched partition keeps its exact files —
  *      at 100 TB a forget request for one user rewrites the handful
  *      of day-partitions they appear in, not the table.
  *
  * The key set rides a broadcast join, not an `isin` literal: a GDPR
  * batch can be millions of keys, and an IN-list is O(|keys|) per row
  * in the plan — a broadcast hash join is O(1) per row and the same
  * plan at 10 keys or 10 million. The anti join also gets the null
  * semantics right for free: a NULL key never equals any erase key, so
  * null-key rows are RETAINED by the rewrite (an `isin` anti-filter
  * evaluates to NULL on them and silently destroys them).
  * Idempotent: a second run locates zero affected partitions.
  */
object Forget {

  case class Stats(partitionsRewritten: Int, rowsRemoved: Long)

  private val KeyAlias = "__forget_key"

  /** Seq-of-keys convenience wrapper over [[forgetKeyFrame]]. */
  def forgetKeys(
      spark: SparkSession,
      root: String,
      keyCol: String,
      keys: Seq[Long],
      partCols: Seq[String]): Stats = {
    import spark.implicits._
    forgetKeyFrame(spark, root, keyCol, keys.toDF(KeyAlias), partCols)
  }

  /** @param root    lake root written with partitionBy(partCols)
    * @param keyCol  column holding the key to erase
    * @param keysDf  single-column frame of key values to erase (any
    *                column name; deduplicated here)
    * @param partCols the table's partition columns, outermost first */
  def forgetKeyFrame(
      spark: SparkSession,
      root: String,
      keyCol: String,
      keysDf: DataFrame,
      partCols: Seq[String]): Stats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyFrame =
      broadcast(keysDf.select(col(keysDf.columns.head).as(KeyAlias)).distinct())
    val lake = spark.read.parquet(root)
    val hit = lake.join(keyFrame, col(keyCol) === col(KeyAlias), "left_semi")

    // pass 1: affected partitions + removed-row count, one pruned scan.
    val affected = hit.groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .collect()
    val removed = affected.map(_.getAs[Long]("n")).sum
    if (affected.isEmpty) return Stats(0, 0L)

    // pass 2: rewrite only the hit leaves.
    affected.foreach { row =>
      val leaf = partCols.foldLeft(rootPath) { (p, c) =>
        new Path(p, s"$c=${row.getAs[Any](c)}")
      }
      // plan the read BEFORE creating the tmp dir (Compact's contract:
      // the file index lists the leaf at read() time).
      val part = spark.read.parquet(leaf.toString)
        .join(keyFrame, col(keyCol) === col(KeyAlias), "left_anti")
      val files = fs.listStatus(leaf).filter(s =>
        s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
      val tmp = new Path(leaf, ".forget-tmp")
      part.write.mode("overwrite").parquet(tmp.toString)
      val newFiles = fs.listStatus(tmp).filter(s =>
        s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_")).map(_.getPath)
      // Rename in first, delete originals second: a reader (or crash)
      // between the steps sees new+old — duplicate rows under the
      // at-least-once contract — never an empty leaf. Recovery from a
      // crash mid-swap: rerun (the semi-join locate finds the leaf
      // again iff old files with live keys remain).
      newFiles.zipWithIndex.foreach { case (f, i) =>
        fs.rename(f, new Path(leaf, s"part-forget-$i-${f.getName.stripPrefix("part-")}"))
      }
      files.foreach(f => fs.delete(f.getPath, false))
      fs.delete(tmp, true)
    }
    Stats(affected.length, removed)
  }
}
