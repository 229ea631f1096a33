package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import graft.ext.{Dedup, TextOps}

/** Ad-hoc probe main (dev-only): edit body, `runMain graft.tools.Scratch`. */
object Scratch {
  def shingleRowsWin(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(id.as("doc"), posexplode(TextOps.tokens(text)).as(Seq("pos", "w")))
    val win = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val leads = (1 until n).map(k => lead(col("w"), k).over(win).as(s"w$k"))
    toks.select(col("doc") +: col("w") +: leads: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc"), concat_ws(" ", col("w") +: (1 until n).map(k => col(s"w$k")): _*).as("s"))
  }
  def sigs(sh: DataFrame): DataFrame = {
    val digests = sh.select(col("doc") +: (0 until 8).map(i =>
      md5(concat(lit(s"$i:"), col("s")).cast("binary")).as(s"m$i")): _*)
    val mins = (0 until 32).map(k => min(substring(col(s"m${k / 4}"), 1 + (k % 4) * 8, 8)).as(s"h$k"))
    digests.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
  }
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("scratch")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    s.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.queries.ExtQueries.withNearDups(graft.Tables.documents(s, d))
    for (i <- 1 to 3) {
      t(s"sig_elementat_$i")(sigs(Dedup.shingleRows(docs, col("doc_id"), col("text"), 3)).count())
      t(s"sig_window_$i")(sigs(shingleRowsWin(docs, col("doc_id"), col("text"), 3)).count())
    }
    s.stop()
  }
}
