package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
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
  *   1. locate: one column-pruned scan (key + partition columns only;
  *      the IN filter pushes down to the parquet row groups) finds the
  *      partitions that actually contain the keys, and the global
  *      removed-row count.
  *   2. rewrite: ONLY those partition leaves are read, anti-filtered,
  *      and swapped in place (Compact's read → hidden tmp → delete →
  *      rename contract: readers mid-swap see old or new+old, never
  *      zero files). Every untouched partition keeps its exact files —
  *      at 100 TB a forget request for one user rewrites the handful
  *      of day-partitions they appear in, not the table.
  *
  * Keys arrive as a literal Seq (forget-request batches are small); a
  * corpus-sized erasure list would instead broadcast-anti-join a keys
  * frame through the same leaf loop — same shape, different predicate.
  * Idempotent: a second run locates zero affected partitions.
  */
object Forget {

  case class Stats(partitionsRewritten: Int, rowsRemoved: Long)

  /** @param root    lake root written with partitionBy(partCols)
    * @param keyCol  column holding the key to erase
    * @param keys    key values to erase
    * @param partCols the table's partition columns, outermost first */
  def forgetKeys(
      spark: SparkSession,
      root: String,
      keyCol: String,
      keys: Seq[Long],
      partCols: Seq[String]): Stats = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lake = spark.read.parquet(root)
    val hit = lake.filter(col(keyCol).isin(keys: _*))

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
        .filter(!col(keyCol).isin(keys: _*))
      val files = fs.listStatus(leaf).filter(s =>
        s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
      val tmp = new Path(leaf, ".forget-tmp")
      part.write.mode("overwrite").parquet(tmp.toString)
      val newFiles = fs.listStatus(tmp).filter(s =>
        s.isFile && !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_")).map(_.getPath)
      files.foreach(f => fs.delete(f.getPath, false))
      newFiles.zipWithIndex.foreach { case (f, i) =>
        fs.rename(f, new Path(leaf, s"part-forget-$i-${f.getName.stripPrefix("part-")}"))
      }
      fs.delete(tmp, true)
    }
    Stats(affected.length, removed)
  }
}
