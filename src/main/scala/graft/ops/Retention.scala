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
    * @return number of day-partitions removed
    */
  def dropExpiredPartitions(lakePath: String, cutoff: java.time.LocalDate): Int = {
    val root = new java.io.File(lakePath)
    if (!root.isDirectory) return 0
    def num(dir: java.io.File, prefix: String): Option[Int] =
      dir.getName.stripPrefix(prefix).toIntOption
    var dropped = 0
    for {
      y <- root.listFiles().toSeq if y.isDirectory
      yv <- num(y, "year=")
      m <- y.listFiles().toSeq if m.isDirectory
      mv <- num(m, "month=")
      d <- m.listFiles().toSeq if d.isDirectory
      dv <- num(d, "day=")
      if java.time.LocalDate.of(yv, mv, dv).isBefore(cutoff)
    } {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d); dropped += 1
    }
    dropped
  }
}
