package graft.io

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BucketedJoinSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across sessions but the
    // warehouse directory survives — remove it so saveAsTable can recreate
    val loc = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-warehouse/$name")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(loc)
  }

  test("co-located join on bucketed tables: zero Exchange, results identical") {
    dropTable("li_b"); dropTable("ord_b")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    Bucketed.write(li, "li_b", buckets = 8, key = "l_orderkey",
      sortCols = Seq("l_orderkey"))
    Bucketed.write(ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", buckets = 8, key = "l_orderkey", sortCols = Seq("l_orderkey"))

    // disable auto-broadcast so the plan must be a sort-merge join —
    // the point is that bucketing makes the SMJ exchange-AND-sort-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // same rows as the plain (shuffling) join over the raw parquet
      val expected = li.join(
        ord.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      assert(joined.count() == expected.count())
      assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregation on the bucket key also skips the shuffle") {
    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"groupBy on the bucket key must reuse the bucketing:\n$plan")
  }
}
