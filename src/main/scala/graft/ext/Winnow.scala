package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): every window of [[W]] consecutive k-gram hashes selects its
  * RIGHTMOST MINIMUM, giving the paper's guarantee that any shared run
  * of ≥ w+k−1 tokens between two documents shares a selected
  * fingerprint — the bound doc_fingerprint's plain modular sampling
  * lacks.
  *
  * The sliding-window definition is re-expressed as a per-position
  * predicate so selection runs as ONE Window exec (no w-way self-join
  * and no per-doc collect): position p is selected ⟺ for some split
  * l + r = W−1 with both neighbor frames fully in bounds, all l left
  * neighbors have h ≥ h_p and all r right neighbors have h > h_p
  * (strict on the right = rightmost-min tie-break). WinnowSpec
  * brute-force-verifies the equivalence on thousands of random
  * sequences.
  *
  * 100 TB shape: the only pass is a per-doc window over (pos, h) rows
  * — partitions balance by document, state is W−1 rows; downstream
  * consumers ride the selected ~2/(W+1) subset.
  */
object Winnow {

  /** Winnow window size (w=4 ⇒ expected density 2/(w+1) = 0.4). */
  val W = 4

  /** Adds boolean `sel` to a (doc, pos, h) frame: true iff some
    * length-[[W]] window of consecutive positions selects this row's
    * hash under the rightmost-min rule. Column names in the output:
    * doc_id, pos, h, sel. */
  def selected(sh: DataFrame, doc: Column, pos: Column, h: Column): DataFrame = {
    val base = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    var df = sh.select(doc.as("doc_id"), pos.as("pos"), h.as("h"))
    for (k <- 1 until W) {
      df = df
        .withColumn(s"lmin$k", min(col("h")).over(base.rowsBetween(-k, -1)))
        .withColumn(s"lcnt$k", count(lit(1)).over(base.rowsBetween(-k, -1)))
        .withColumn(s"rmin$k", min(col("h")).over(base.rowsBetween(1, k)))
        .withColumn(s"rcnt$k", count(lit(1)).over(base.rowsBetween(1, k)))
    }
    def okL(l: Int): Column =
      if (l == 0) lit(true)
      else col(s"lcnt$l") === l && col(s"lmin$l") >= col("h")
    def okR(r: Int): Column =
      if (r == 0) lit(true)
      else col(s"rcnt$r") === r && col(s"rmin$r") > col("h")
    df.select(col("doc_id"), col("pos"), col("h"),
      (0 until W).map(l => okL(l) && okR(W - 1 - l)).reduce(_ || _).as("sel"))
  }

  /** Reference implementation of the sliding-window definition, used
    * only by WinnowSpec to verify [[selected]]: returns the set of
    * selected positions for one hash sequence. */
  def bruteForce(hs: IndexedSeq[Long]): Set[Int] = {
    val m = hs.length
    (0 to m - W).flatMap { j =>
      val win = (j until j + W)
      val mn = win.map(hs).min
      Some(win.filter(i => hs(i) == mn).max)
    }.toSet
  }
}
