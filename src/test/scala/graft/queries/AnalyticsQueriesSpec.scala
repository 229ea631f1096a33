package graft.queries

import graft.SparkSpec

/** Semantic gates for analytics queries whose oracle checks equality
  * but not the operator's OWN invariants. */
class AnalyticsQueriesSpec extends SparkSpec {

  test("skyline_frontier: window algebra ≡ brute-force dominance") {
    val out = AnalyticsQueries.queries("skyline_frontier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "cheapest price group's max size is always on the frontier")
    // Brute-force oracle on the spec SF: a part is on the skyline iff
    // no other part is ≤ on price, ≥ on size, and strict in one.
    val parts = graft.Tables.part(spark, sf)
      .selectExpr("p_partkey",
        "CAST(floor(p_retailprice * 100 + 0.5) AS LONG) AS cents",
        "CAST(p_size AS LONG) AS sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = parts.filter { case (k, c, z) =>
      !parts.exists { case (k2, c2, z2) =>
        k2 != k && c2 <= c && z2 >= z && (c2 < c || z2 > z)
      }
    }.map(t => (t._1, t._2, t._3)).sortBy(_._1)
    assert(out.sortBy(_._1).toSeq === expected.toSeq)
  }

  test("seasonal_decompose: deviations conserve (Σ dev_num = 0), hours complete") {
    val out = AnalyticsQueries.queries("seasonal_decompose")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // The 7-day hourly corpus populates every hour of day.
    assert(out.map(_._1).sorted.toSeq === (0L until 24L))
    // Additive decomposition conservation: Σ_h (sum_h·n_tot −
    // sum_tot·n_h) telescopes to exactly zero — a mean-vs-global
    // bookkeeping bug (dropped hour, double-counted total) breaks it.
    assert(out.map(_._4).sum === 0L)
    // The 1e6 cell carries dev_num's sign and is bounded by the
    // centi-value range (HALF_UP of a mean deviation in cents × 1e6).
    assert(out.forall { case (_, _, _, dev, cell) =>
      (dev >= 0) == (cell >= 0) || cell == 0 })
  }

  test("k_anonymity: every customer released exactly once, every class ≥ k or suppressed") {
    val out = AnalyticsQueries.queries("k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val total = graft.Tables.customer(spark, sf).count()
    assert(out.map(_._4).sum == total, "released class sizes must conserve the population")
    out.filter(_._1 < 2).foreach { case (lvl, geo, seg, n) =>
      assert(n >= 10, s"level-$lvl class ($geo, $seg) below k: $n")
    }
    // the ladder itself is exercised (at the tiny spec SF every
    // (nation, segment) class is below k, so everything climbs —
    // level-0 coverage is gated by the sf0.01/sf0.1 oracle instead)
    assert(out.nonEmpty, "some class is always released")
    assert(out.count(_._1 == 2L) <= 1, "at most one suppressed bucket")
  }
}
