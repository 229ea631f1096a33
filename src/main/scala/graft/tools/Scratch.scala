package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Contamination, Packing, Repetition, TextOps}

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: 10× corpus probe for the round-5 text operators (SCALE.md
  * methodology: replica k rotates tokens by k, id offset 100000·k). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"
    val out = "/tmp/sf1x_docs"
    if (!new java.io.File(out).exists()) {
      val docs = s.read.parquet(s"$sf/documents.parquet")
      val reps = (0 until 10).map { k =>
        val toks = TextOps.tokens(col("text"))
        val rotated =
          if (k == 0) col("text")
          else concat_ws(" ", flatten(array(
            slice(toks, k + 1, 1000000), slice(toks, 1, k))))
        docs.select((col("doc_id") + lit(100000L * k)).as("doc_id"),
          rotated.as("text"))
      }
      reps.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(out)
    }
    def clear(): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(name: String)(f: => Long): Unit = {
      clear()
      val t0 = System.nanoTime(); val n = f
      System.err.println(
        f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    def exchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(_.contains("Exchange"))
    val d1 = s.read.parquet(s"$sf/documents.parquet")
    val d10 = s.read.parquet(out)
    def pack(d: DataFrame) = Packing.packOffsets(
      d, col("doc_id"), size(TextOps.tokens(col("text"))), 8, 256)
    def rep(d: DataFrame) = Repetition.stats(d, col("doc_id"), col("text"))
    def con(d: DataFrame) = Contamination.check(d, col("doc_id"), col("text"))
    System.err.println(s"[probe] exchanges: pack=${exchanges(pack(d10))} " +
      s"repetition=${exchanges(rep(d10))} contam=${exchanges(con(d10))}")
    for (r <- 1 to 2) {
      time(s"pack 1x r$r")(pack(d1).count())
      time(s"pack 10x r$r")(pack(d10).count())
      time(s"repetition 1x r$r")(rep(d1).count())
      time(s"repetition 10x r$r")(rep(d10).count())
      time(s"contam 1x r$r")(con(d1).count())
      time(s"contam 10x r$r")(con(d10).count())
    }
    s.stop()
  }
}
