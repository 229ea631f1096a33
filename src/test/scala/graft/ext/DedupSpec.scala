package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words entirely here now today friends")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one canonical row per normalized text") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
    assert(out.count() == 3)
    val dup = out.filter(col("n_copies") === 2).head()
    assert(dup.getLong(dup.fieldIndex("keep_doc_id")) == 1L)
  }

  test("minhash: identical docs → est_jaccard 1.0; unrelated not paired") {
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("per-row minhashSignature ≡ bulk minhashSignatures (one hash family)") {
    // The streaming near-dup stage derives signatures per row while
    // the batch join uses the bulk explode+aggregate path — the
    // stream ≡ batch gate only holds if both are the SAME family (a
    // double-division digest prefix silently forked them once).
    val bulk = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perRow = docs.select(col("doc_id"), Dedup.minhashSignature(
        TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(perRow.keySet == bulk.keySet)
    perRow.foreach { case (id, s) => assert(s == bulk(id), s"doc $id") }
    // ... and the fused streaming kernel is the same family too
    val kernel = docs.select(col("doc_id"), graft.ext.expr.MinhashSignature.of(
        TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel == bulk)
  }

  test("minhash signature is deterministic across runs") {
    val sig = docs.select(
      Dedup.minhashSignature(TextOps.shingles(TextOps.tokens(col("text")), 3)))
    assert(sig.collect().toSeq == sig.collect().toSeq)
  }

  test("custom MinhashDigests expression ≡ built-in md5/substr/conv formulation") {
    // the custom expression must produce bit-identical hash values to
    // the portable column formulation the DuckDB oracle replicates
    val sh = docs.select(col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
    val viaExpr = sh.select(col("doc_id"), col("s"),
      graft.ext.expr.MinhashDigests.hashes(col("s")).as("hv"))
    val viaBuiltins = (0 until Dedup.NumHashes).map { k =>
      conv(substring(md5(concat(lit(s"${k / 4}:"), col("s")).cast("binary")),
        1 + (k % 4) * 8, 8), 16, 10).cast("long")
    }
    val joined = viaExpr.select(col("hv") +: viaBuiltins.zipWithIndex.map {
      case (c, k) => (element_at(col("hv"), k + 1) === c).as(s"eq$k")
    }: _*)
    val allEq = joined.select(
      (0 until Dedup.NumHashes).map(k => col(s"eq$k")).reduce(_ && _).as("ok"))
    assert(allEq.filter(!col("ok")).count() == 0)
  }

  test("Md5Prefix64 ≡ first 16 hex nibbles of md5") {
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
    val both = toks.select(
      graft.ext.expr.Md5Prefix64.of(col("t")).as("h64"),
      conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10).cast("long").as("hi60"))
    // top 60 bits of the prefix must equal the 15-hex-char parse
    val bad = both.filter(shiftrightunsigned(col("h64"), 4) =!= col("hi60"))
    assert(bad.count() == 0)
  }

  test("simhash: identical → hamming 0; near-dup closer than unrelated") {
    val sh = Dedup.simhash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("dedup groups: transitive pairs collapse to one component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val groups = Dedup.dedupGroups(pairs, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L)
    assert(groups(10L) == 10L && groups(11L) == 10L)
  }

  test("dedup groups: chain component needs propagation over >1 hop") {
    // 9-8, 8-7, ..., 2-1: single chain; all must collapse to group 1
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val groups = Dedup.dedupGroups(chain, col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.values.toSet == Set(1L))
    assert(groups.size == 10)
  }

  test("dedup groups: union-find, Pregel, and DF-loop agree on labels") {
    // Chain (deep propagation), clique, a crossing merge (10,20) joining
    // chain and clique into one component, plus small separate groups —
    // the same graphs must label identically through all three paths:
    // driver union-find (default below threshold), GraphX Pregel and the
    // DF loop (both forced via coordinatorMaxEdges = 0).
    val edges = ((1L until 10L).map(i => (i, i + 1)) ++
      (for (x <- 20L to 24L; y <- (x + 1) to 24L) yield (x, y)) ++
      Seq((10L, 20L), (50L, 51L), (52L, 51L), (52L, 53L), (100L, 101L)))
      .toDF("a", "b")
    def labels(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val uf = labels(Dedup.dedupGroups(edges, col("a"), col("b")))
    val pregel = labels(
      Dedup.dedupGroups(edges, col("a"), col("b"), coordinatorMaxEdges = 0))
    val dfLoop = labels(
      Dedup.dedupGroupsDF(edges, col("a"), col("b"), coordinatorMaxEdges = 0))
    assert(uf == pregel)
    assert(uf == dfLoop)
    // group = min reachable: merged chain+clique all label 1
    assert(uf.filter(_._1 <= 24L).forall(_._2 == 1L))
    assert(uf.filter(e => e._1 >= 50L && e._1 <= 53L).forall(_._2 == 50L))
  }

  test("semanticDrops: cluster cap re-anchor-splits oversized clusters") {
    // 6 vectors, nAnchors=1 → one 6-row cluster. Pairs: (0,3) and
    // (1,2) are exact dups; the rest are orthogonal or anti-parallel.
    val corpus = Seq(
      (0L, Array(1000L, 0L, 0L)),
      (1L, Array(0L, 1000L, 0L)),
      (2L, Array(0L, 1000L, 0L)),
      (3L, Array(1000L, 0L, 0L)),
      (4L, Array(0L, 0L, 1000L)),
      (5L, Array(0L, 0L, -1000L))
    ).toDF("vec_id", "q")
    def drops(cap: Int): Map[Long, Long] =
      Dedup.semanticDrops(corpus, nAnchors = 1, cap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Uncapped (cap ≥ cluster size): both dup pairs found.
    assert(drops(1000) == Map(3L -> 0L, 2L -> 1L))
    // cap=2 → nsplit = ceil(6/2) = 3, sub = vec_id % 3: (0,3) share
    // sub 0 and survive; (1,2) land in subs 1 vs 2 and are no longer
    // compared — the documented approximation the cap trades for
    // bounded join buckets.
    assert(drops(2) == Map(3L -> 0L))
  }

  test("similarityJoin (prefix filter) ≡ brute-force exact join at 3 thresholds") {
    import spark.implicits._
    val corpus = docs.unionByName(Seq(
      (5L, "too short"),                                          // no 3-shingles → excluded
      (6L, "the quick brown fox jumps over the lazy dog today")   // superset of doc 1
    ).toDF("doc_id", "text"))
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def brute(num: Int, den: Int) = {
      val sh = corpus.select(col("doc_id"),
        array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
      collectSet(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          col("doc_a") < col("doc_b"))
        .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("nu",
          (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("ni"))
        .filter(col("ni") * den >= col("nu") * num)
        .select(col("doc_a"), col("doc_b"),
          round(col("ni").cast("double") / col("nu"), 4).as("jaccard")))
    }
    def pj(num: Int, den: Int) = collectSet(
      Dedup.similarityJoin(corpus, col("doc_id"), col("text"), num, den))
    for ((num, den) <- Seq((1, 2), (3, 5), (9, 10)))
      assert(pj(num, den) == brute(num, den), s"t=$num/$den")
    // boundary exactness: docs 3 and 6 sit at J = 5/10 = t exactly —
    // the integer cross-multiply keeps them IN at t=1/2 in both forms
    assert(pj(1, 2).exists(p => p._1 == 3L && p._2 == 6L && p._3 == 0.5))
    // high threshold keeps only the exact dup
    assert(pj(9, 10).map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("containmentJoin finds excerpts Jaccard misses; ≡ brute force") {
    import spark.implicits._
    // doc 8 is the first 6 tokens of doc 7 — a strict excerpt: its 4
    // shingles are all inside doc 7's 18, so containment 1.0 while
    // Jaccard is 4/18 ≈ 0.22 (invisible at any high J threshold).
    val long = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (7L, long),
      (8L, "alpha beta gamma delta epsilon zeta"),
      (9L, "unrelated words entirely different from everything here now")
    ).toDF("doc_id", "text")
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val out = collectSet(
      Dedup.containmentJoin(corpus, col("doc_id"), col("text"), 9, 10))
    assert(out == Set((7L, 8L, 1.0)))
    // simjoin at t=3/5 must NOT see the excerpt pair
    assert(collectSet(Dedup.similarityJoin(corpus, col("doc_id"),
      col("text"), 3, 5)).isEmpty)
    // brute-force equivalence on the shared fixture incl. equal-size
    // near-dup pairs (docs 1-4 + the excerpt corpus)
    val mixed = docs.unionByName(corpus)
    val sh = mixed.select(col("doc_id"), array_distinct(
      graft.ext.expr.ShingleMd5.shingleMd5(
        TextOps.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = collectSet(
      sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          col("doc_a") < col("doc_b"))
        .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("mn",
          least(size(col("sh_a")), size(col("sh_b"))).cast("long"))
        .filter(col("ni") * 10 >= col("mn") * 9)
        .select(col("doc_a"), col("doc_b"),
          round(col("ni").cast("double") / col("mn"), 4).as("containment")))
    assert(collectSet(Dedup.containmentJoin(mixed, col("doc_id"),
      col("text"), 9, 10)) == brute)
  }

  test("ngram jaccard: identical → 1.0, disjoint → 0.0") {
    val sh = TextOps.shingles(TextOps.tokens(col("text")), 3)
    val a = docs.select(col("doc_id").as("ida"), sh.as("sa"))
    val b = docs.select(col("doc_id").as("idb"), sh.as("sb"))
    val j = a.join(b, lit(true))
      .select(col("ida"), col("idb"), Dedup.ngramJaccard(col("sa"), col("sb")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
    assert(j((1L, 3L)) > 0.0 && j((1L, 3L)) < 1.0)
  }
}
