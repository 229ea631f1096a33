package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeScd2Spec extends SparkSpec {
  import spark.implicits._

  // ---- sessionize ------------------------------------------------------

  test("sessionize splits on gap, merges within gap, first event opens") {
    // user 1: events at t=0, 10, 25 (gap 15 splits 10→25), then 100.
    // user 2: single event.
    val df = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 25L, 3L), (1L, 100L, 4L),
      (2L, 50L, 5L)
    ).toDF("user_id", "tus", "event_id")
    val out = Sessionize.sessionize(df, Seq(col("user_id")),
        col("tus"), col("event_id"), gapUs = 14L)
      .orderBy("user_id", "session_start_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 10L, 2L, 10L),   // 0 and 10 merge (gap 10 ≤ 14)
      (1L, 25L, 25L, 1L, 0L),   // 25 is 15 > 14 after 10
      (1L, 100L, 100L, 1L, 0L),
      (2L, 50L, 50L, 1L, 0L)))
  }

  test("sessionize boundary: gap exactly equal to threshold merges") {
    val df = Seq((1L, 0L, 1L), (1L, 14L, 2L)).toDF("user_id", "tus", "event_id")
    val out = Sessionize.sessionize(df, Seq(col("user_id")),
      col("tus"), col("event_id"), gapUs = 14L).collect()
    assert(out.length == 1 && out(0).getLong(3) == 2L)
  }

  test("sessionize pays exactly one exchange and one sort") {
    // lag() and the running sum use different frames, so Catalyst plans
    // two Window operators — but they share partitioning + ordering, so
    // the second is pipelined on the first's sort: ONE shuffle, ONE sort
    // (the per-event self-join formulation would add a second of each).
    val df = graft.Tables.events(spark, sf)
      .select(col("user_id"), graft.Tables.tsUs.as("tus"), col("event_id"))
    val out = Sessionize.sessionize(df, Seq(col("user_id")),
      col("tus"), col("event_id"), gapUs = 1000000L)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\+- Sort ".r.findAllIn(plan).length
    assert(exchanges == 1 && sorts == 1,
      s"expected one exchange + one sort:\n$plan")
  }

  // ---- SCD2 --------------------------------------------------------------

  test("scd2 intervals chain per key; last version open and current") {
    val df = Seq(
      (10L, 100L, 1L, "a"), (10L, 200L, 2L, "b"), (10L, 300L, 3L, "c"),
      (20L, 150L, 4L, "x")
    ).toDF("k", "ts", "id", "v")
    val out = Scd2.intervals(df, Seq(col("k")), col("ts"), col("id"),
        Seq(col("v")))
      .orderBy("k", "valid_from_us")
      .collect()
    val rows = out.map(r => (
      r.getLong(0),
      r.getLong(r.fieldIndex("valid_from_us")),
      Option(r.get(r.fieldIndex("valid_to_us"))).map(_.asInstanceOf[Long]),
      r.getBoolean(r.fieldIndex("is_current")),
      r.getString(r.fieldIndex("v"))))
    assert(rows.toSeq == Seq(
      (10L, 100L, Some(200L), false, "a"),
      (10L, 200L, Some(300L), false, "b"),
      (10L, 300L, None, true, "c"),
      (20L, 150L, None, true, "x")))
  }

  test("scd2 simultaneous versions order by tiebreak deterministically") {
    val df = Seq((1L, 100L, 2L, "later"), (1L, 100L, 1L, "earlier"))
      .toDF("k", "ts", "id", "v")
    val out = Scd2.intervals(df, Seq(col("k")), col("ts"), col("id"),
        Seq(col("v")))
      .orderBy("tie").collect()
    // id=1 closed by id=2 (same ts): tiebreak decides.
    assert(!out(0).getBoolean(out(0).fieldIndex("is_current")))
    assert(out(1).getBoolean(out(1).fieldIndex("is_current")))
  }

  test("scd2 current rows equal latest-per-key") {
    val orders = graft.Tables.orders(spark, sf)
    val hist = Scd2.intervals(orders, Seq(col("o_custkey")),
      unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderkey"),
      Seq(col("o_totalprice")))
    val current = hist.filter(col("is_current"))
      .select(col("o_custkey"), col("tie").as("o_orderkey"))
    val latest = orders
      .groupBy(col("o_custkey"))
      .agg(max_by(col("o_orderkey"),
        struct(unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderkey"))).as("o_orderkey"))
    assert(current.except(latest).isEmpty && latest.except(current).isEmpty)
    assert(current.count() == orders.select("o_custkey").distinct().count())
  }
}
