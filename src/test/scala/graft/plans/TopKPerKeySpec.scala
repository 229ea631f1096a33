package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The custom grouped-top-k physical operator vs the window form it
  * replaces: same rows on every shape (ties, nulls, short groups), and
  * the plan the operator exists for (map-side prune, one exchange, no
  * Window, no Sort). */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
      key: String, order: Seq[org.apache.spark.sql.Column], k: Int) = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("matches row_number() <= k on a fact table (total ordering)") {
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val ord = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val custom = TopKPerKey.perKey(li, Seq(col("l_suppkey")), ord, k = 3)
    assert(sortedRows(custom) == sortedRows(windowTopK(li, "l_suppkey", ord, 3)))
  }

  test("keeps whole groups smaller than k, and exactly k elsewhere") {
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10), ("c", 5), ("c", 6))
      .toDF("key", "v")
    val out = TopKPerKey.perKey(df, Seq(col("key")), Seq(col("v")), k = 2)
      .as[(String, Int)].collect().sorted.toSeq
    assert(out == Seq(("a", 1), ("a", 2), ("b", 10), ("c", 5), ("c", 6)))
  }

  test("null keys form their own group; null ordering values follow sort defaults") {
    val df = Seq(
      (Some("a"), Some(3)), (Some("a"), None), (Some("a"), Some(1)),
      (None, Some(7)), (None, Some(2)), (None, None))
      .toDF("key", "v")
    val ord = Seq(col("v").desc) // DESC => NULLS LAST default
    val custom = TopKPerKey.perKey(df, Seq(col("key")), ord, k = 2)
    assert(sortedRows(custom) == sortedRows(windowTopK(df, "key", ord, 2)))
  }

  test("duplicate ordering values: exactly k survive per key (row_number, not rank)") {
    val df = Seq.tabulate(40)(i => (i % 4, 100, i)).toDF("key", "v", "uid")
    // v ties everywhere; uid makes the ordering total and deterministic
    val ord = Seq(col("v").desc, col("uid"))
    val custom = TopKPerKey.perKey(df, Seq(col("key")), ord, k = 3)
    assert(custom.count() == 12)
    assert(sortedRows(custom) == sortedRows(windowTopK(df, "key", ord, 3)))
  }

  test("plans partial→exchange→final with no Window and no Sort") {
    val li = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val p = TopKPerKey.perKey(li, Seq(col("l_suppkey")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), "must not fall back to a window plan")
    assert(!p.contains("Sort "), "must not plan any sort")
  }

  test("rejects non-positive k") {
    val df = Seq(("a", 1)).toDF("key", "v")
    assertThrows[IllegalArgumentException] {
      TopKPerKey.perKey(df, Seq(col("key")), Seq(col("v")), 0)
    }
  }
}
