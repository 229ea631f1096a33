package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, TextOps}

/** Dev scratchpad (see .claude/skills/verify) — contents are transient.
  * Current: round-8 10× scale probe for SCALE.md — dsir_weights
  * throughput and distinct-term growth at 10× document volume. */
object Scratch {

  private def timeMin2(body: => Long): (Double, Long) = {
    val runs = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.head._2)
  }

  /** The dsir_weights shape (ExtQueries) parameterized by the corpus,
    * so the probe can feed a replicated frame. */
  private def dsir(docs: DataFrame): DataFrame = {
    val tf = Dedup.rebalance(docs)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val cc = tf.groupBy(col("term")).agg(sum(col("tf")).as("cc"))
    val tc = tf.filter(col("lang") === "en")
      .groupBy(col("term")).agg(sum(col("tf")).as("tc"))
    val totals = cc.agg(sum(col("cc")).as("c_tot"), count(lit(1)).as("v"))
      .crossJoin(tc.agg(sum(col("tc")).as("t_tot")))
    val dlp = cc.join(tc, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col("term"),
        (floor(log((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (col("t_tot") + col("v")).cast("double")) * 1e6 + 0.5).cast("long") -
         floor(log((col("cc") + 1).cast("double") /
            (col("c_tot") + col("v")).cast("double")) * 1e6 + 0.5).cast("long"))
          .as("dlp_x1e6"))
    tf.join(dlp, "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("dlp_x1e6")).as("weight_x1e6"))
  }

  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("graft-scratch")
    val sf = "/root/testdata/sf0.1"

    // 10× corpus: id-offset replicas with a distinguishing suffix token
    // appended per replica so the distinct-term space grows too (a pure
    // replica would leave |V| constant — unrealistically easy).
    val base = Tables.documents(s, sf)
    def corpusX(reps: Int): DataFrame = (0 until reps).map { k =>
      base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("lang"),
        concat(col("text"), lit(s" rep${k}tok"),
          (col("doc_id") % 97).cast("string")).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)

    for ((label, reps) <- Seq("1x" -> 1, "10x" -> 10)) {
      val c = corpusX(reps)
      val nv = dsir(c).agg(count(lit(1))).head().getLong(0)
      val (t, n) = timeMin2(dsir(c).count())
      System.err.println(f"[probe] dsir $label: $t%6.2fs docs=$n (check=$nv)")
    }
    s.stop()
  }
}
