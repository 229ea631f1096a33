package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention-policy semantics (SURVEY §2 K3).
  *
  * Reference: TimescaleDB `add_retention_policy(..., INTERVAL '90 days')`
  * (`infrastructure setup/init-db.sql:43-44`) — automatic chunk drop past
  * the horizon. Spark-native analog: a partition-pruned predicate for
  * reads, and whole-partition-directory drops for storage (year/month/day
  * layout → deleting a day is a metadata op, no rewrite).
  */
object Retention {

  /** Rows within `horizonUs` of the dataset's own max timestamp
    * (epoch-micros long column). The max is a 1-row broadcast — no
    * second full scan shuffle. */
  def retain(df: DataFrame, tsUs: Column, horizonUs: Long): DataFrame = {
    val cutoff = df.agg((max(tsUs) - horizonUs).as("cutoff"))
    df.crossJoin(broadcast(cutoff)).filter(tsUs >= col("cutoff")).drop("cutoff")
  }

  /** Storage-side retention on a year/month/day-partitioned lake path:
    * drop whole expired partition directories — a metadata operation,
    * no data rewrite (the Spark analog of TimescaleDB's chunk drop;
    * at 100 TB this is the only affordable form of retention).
    *
    * Uses the Hadoop `FileSystem` API, so the same call works against
    * local paths, HDFS, or any object store with a Hadoop connector —
    * `java.io.File` (round 1) was local-FS only, which made the
    * "affordable at 100 TB" claim untrue on a real lake.
    *
    * @return number of day-partitions removed
    */
  def dropExpiredPartitions(
      lakePath: String,
      cutoff: java.time.LocalDate,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Int = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val root = new Path(lakePath)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root) || !fs.getFileStatus(root).isDirectory) return 0
    def num(st: FileStatus, prefix: String): Option[Int] = {
      val name = st.getPath.getName
      if (name.startsWith(prefix)) name.stripPrefix(prefix).toIntOption else None
    }
    var dropped = 0
    for {
      y <- fs.listStatus(root).toSeq if y.isDirectory
      yv <- num(y, "year=")
      m <- fs.listStatus(y.getPath).toSeq if m.isDirectory
      mv <- num(m, "month=")
      d <- fs.listStatus(m.getPath).toSeq if d.isDirectory
      dv <- num(d, "day=")
      if java.time.LocalDate.of(yv, mv, dv).isBefore(cutoff)
    } {
      fs.delete(d.getPath, true)
      dropped += 1
    }
    dropped
  }
}
