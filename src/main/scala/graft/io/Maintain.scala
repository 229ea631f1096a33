package graft.io

import org.apache.spark.sql.functions.col

/** Automatic table maintenance for the snapshot lake — the policy
  * layer Delta/Iceberg run as table services (auto-compaction /
  * OPTIMIZE scheduling): decide FROM THE MANIFEST ALONE (plus a
  * deletion-sized DV count) whether the table has accumulated enough
  * debt to justify one rewrite commit, and perform it.
  *
  * Two debts trigger:
  *  - **small files**: the live file count exceeds `slack` × the
  *    bin-packed ideal ceil(rows / targetRowsPerFile) — the streaming-
  *    sink accumulation [[Compact]] exists for, decided without
  *    listing or reading any data file;
  *  - **DV debt**: merge-on-read deletions have masked more than
  *    `dvRatioNumer/dvRatioDenom` of the manifest rows — every read
  *    is paying the anti-join probe for rows that no longer exist.
  *
  * The rewrite is ONE overwrite commit (range-clustered when
  * `clusterCol` is given, preserving the zone-map discipline); it
  * purges all DVs as a side effect (rewritten files re-stat clean).
  * Healthy tables return without touching data — the check costs a
  * log read, so it can run after every commit at any table size.
  */
object Maintain {

  /** What `auto` decided and did. `maskedBefore` is the DV debt the
    * run saw; `version` is the rewrite commit when one happened. */
  final case class Report(acted: Boolean, reason: String,
      version: Option[Int], filesBefore: Int, filesAfter: Int,
      maskedBefore: Long)

  def auto(lake: Snapshot.Lake, targetRowsPerFile: Long,
      clusterCol: Option[String] = None, slack: Long = 2L,
      dvRatioNumer: Long = 1L, dvRatioDenom: Long = 10L): Report = {
    require(targetRowsPerFile > 0 && slack >= 1 &&
      dvRatioNumer >= 0 && dvRatioDenom > 0, "nonsensical thresholds")
    val lv = lake.latestVersion
    if (lv < 0) return Report(acted = false, "empty lake", None, 0, 0, 0L)
    val state = lake.liveState(lv)
    val files = state.size
    val rows = state.map(_._1.rows).sum // manifest rows (pre-DV)
    val masked = lake.maskedPositions(lv)
    val desired = math.max(1L,
      (rows + targetRowsPerFile - 1) / targetRowsPerFile)
    val smallFiles = files > slack * desired
    val dvDebt = masked * dvRatioDenom > rows * dvRatioNumer
    if (!smallFiles && !dvDebt)
      return Report(acted = false, "healthy", None, files, files, masked)
    val reason = Seq(
      if (smallFiles) Some(s"small-files($files > $slack*$desired)") else None,
      if (dvDebt) Some(s"dv-debt($masked/$rows)") else None
    ).flatten.mkString("+")
    val df = lake.read()
    val nOut = math.min(desired, Int.MaxValue.toLong).toInt
    val v = clusterCol match {
      case Some(c) => lake.overwrite(
        df.repartitionByRange(nOut, col(c)).sortWithinPartitions(c))
      case None => lake.overwrite(df.repartition(nOut))
    }
    Report(acted = true, reason, Some(v), files,
      lake.liveFiles(v).size, masked)
  }
}
