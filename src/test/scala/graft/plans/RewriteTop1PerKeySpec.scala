package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteTop1PerKeySpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    ("m1", 10L, 1L, 5.0), ("m1", 20L, 2L, 6.0), ("m1", 20L, 3L, 7.0),
    ("m2", 5L, 4L, 8.0)
  ).toDF("k", "t", "id", "v")

  private val wDesc = Window.partitionBy($"k").orderBy($"t".desc, $"id".desc)

  test("row_number=1 over desc order rewrites to an aggregate (no Window)") {
    val df = base.withColumn("rn", row_number().over(wDesc))
      .filter($"rn" === 1).drop("rn")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("row_number"), optimized)
    assert(optimized.contains("max_by"), optimized)
    // and the results are the window semantics
    val got = df.orderBy("k").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(("m1", 20L, 3L, 7.0), ("m2", 5L, 4L, 8.0)))
  }

  test("ascending order rewrites to min_by with earliest-row semantics") {
    val wAsc = Window.partitionBy($"k").orderBy($"t".asc, $"id".asc)
    val df = base.withColumn("rn", row_number().over(wAsc))
      .filter($"rn" === 1).drop("rn")
    assert(df.queryExecution.optimizedPlan.toString.contains("min_by"))
    val got = df.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("m1", 10L), ("m2", 5L)))
  }

  test("rank() and rn=2 filters are NOT rewritten") {
    val ranked = base.withColumn("rn", rank().over(wDesc)).filter($"rn" === 1).drop("rn")
    assert(ranked.queryExecution.optimizedPlan.toString.contains("rank"))
    val second = base.withColumn("rn", row_number().over(wDesc)).filter($"rn" === 2).drop("rn")
    assert(second.queryExecution.optimizedPlan.toString.contains("row_number"))
  }

  test("mixed sort directions are NOT rewritten") {
    val wMixed = Window.partitionBy($"k").orderBy($"t".desc, $"id".asc)
    val df = base.withColumn("rn", row_number().over(wMixed)).filter($"rn" === 1).drop("rn")
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number"))
  }

  test("explicit non-default null ordering blocks the rewrite (and keeps window semantics)") {
    // DESC NULLS FIRST: the null-t row must win under row_number; max_by
    // struct comparison sorts nulls per the default (last for DESC), so
    // rewriting would silently pick the wrong row.
    val withNulls = Seq(("m1", Some(10L), 1L), ("m1", None, 2L))
      .toDF("k", "t", "id")
    val w = Window.partitionBy($"k").orderBy($"t".desc_nulls_first)
    val df = withNulls.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn")
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number"))
    assert(df.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("keeping the rn column blocks the rewrite (projection gate)") {
    val df = base.withColumn("rn", row_number().over(wDesc)).filter($"rn" === 1)
    assert(df.queryExecution.optimizedPlan.toString.contains("row_number") ||
      df.columns.contains("rn"))
    assert(df.select("rn").distinct().as[Int].collect().toSeq == Seq(1))
  }
}
