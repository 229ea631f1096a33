package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  // One degenerate block ("blk1": 4 ids, all within lev 2 of each
  // other) plus a singleton block, so the cap has something to split.
  private def pool = Seq(
    (10L, "alice smith", "blk1"),
    (11L, "alice smyth", "blk1"),
    (12L, "alice smite", "blk1"),
    (13L, "alice smitt", "blk1"),
    (99L, "unrelated name", "blk2")
  ).toDF("id", "name", "blk")

  private def pairs(cap: Int): Set[(Long, Long)] =
    Fuzzy.blockedMatch(pool, maxLev = 2, cap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("uncapped: all within-block pairs at lev <= 2, no cross-block") {
    val all = pairs(1000)
    assert(all == Set((10L, 11L), (10L, 12L), (10L, 13L),
      (11L, 12L), (11L, 13L), (12L, 13L)))
  }

  test("block cap re-splits oversized blocks deterministically") {
    // cap=2 → nsplit = ceil(4/2) = 2, sub = md5Hash60(id) % 2:
    // {10,12} (hash odd) vs {11,13} (hash even). Only same-sub pairs
    // survive — the documented approximation the cap trades for
    // bounded join buckets.
    assert(pairs(2) == Set((10L, 12L), (11L, 13L)))
    // cap=3 → nsplit = 2 as well (ceil(4/3)); same split.
    assert(pairs(3) == Set((10L, 12L), (11L, 13L)))
  }

  test("hash split defeats adversarial id residue patterns") {
    // All-even ids: raw `id % 2` would put every row in sub 0 — one
    // sub-block holding the whole hot block, the cap defeated (the
    // exact shape a generator's +offset / ×10 id scheme produces).
    // md5Hash60(id) % 2 still splits them: {10,24} vs {20,26}.
    val evens = Seq(
      (10L, "alice smith", "blk1"),
      (20L, "alice smyth", "blk1"),
      (24L, "alice smite", "blk1"),
      (26L, "alice smitt", "blk1")
    ).toDF("id", "name", "blk")
    val got = Fuzzy.blockedMatch(evens, maxLev = 2, cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 24L), (20L, 26L)))
  }

  test("lev threshold excludes distant names even within a sub-block") {
    val far = Seq(
      (1L, "completely different", "b"),
      (2L, "nothing alike here", "b")
    ).toDF("id", "name", "blk")
    assert(Fuzzy.blockedMatch(far, maxLev = 2).count() == 0)
  }
}
