package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic gates for the end-to-end pipeline: each planted artifact
  * class dies at EXACTLY its stage (the composition property the
  * per-stage oracles cannot check), and survivors obey the stage
  * contracts recomputed independently. */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val st =
    CorpusPipeline.build(graft.Tables.documents(spark, sf))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def inBand(s: Set[Long], lo: Long): Set[Long] =
    s.filter(id => id >= lo && id < lo + 1000000000L)

  test("each planted artifact class dies at its own stage") {
    val aug = ids(st.aug)
    // all five planted classes present up front
    for (off <- Seq(1000000000L, 2000000000L, 5000000000L, 6000000000L,
        7000000000L))
      assert(inBand(aug, off).nonEmpty, s"aug missing band +$off")
    val q = ids(st.afterQuality)
    assert(inBand(q, 2000000000L).isEmpty, "quality must drop the truncations")
    assert(inBand(q, 5000000000L).nonEmpty && inBand(q, 1000000000L).nonEmpty,
      "quality must NOT drop url/near-dup plants")
    val u = ids(st.afterUrlDedup)
    assert(inBand(u, 5000000000L).isEmpty,
      "URL dedup must collapse the same-page messy spellings")
    assert(inBand(u, 6000000000L).nonEmpty,
      "distinct-URL exact copies must SURVIVE url dedup")
    val e = ids(st.afterExactDedup)
    assert(inBand(e, 6000000000L).isEmpty,
      "exact-text dedup must drop the distinct-URL copies")
    assert(inBand(e, 1000000000L).nonEmpty,
      "near-dups are not exact dups — they must reach stage 4")
    val n = ids(st.afterNearDedup)
    // MinHash is an estimator: a SHORT doc's drop-3-tokens copy sits
    // near the 0.5 threshold (11 tokens → J = 6/9 ≈ 0.67, and a 32-
    // hash draw can land under 16/32 — observed for doc 281 at this
    // SF). The invariant that must hold exactly: every near-dup of a
    // ≥20-token doc dies, and escapes are rare overall.
    val longDocs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"))
      .filter(size(TextOps.tokens(col("text"))) >= 20)
      .collect().map(_.getLong(0)).toSet
    val nearSurvivors = inBand(n, 1000000000L)
    val longEscapes = nearSurvivors.filter(id => longDocs(id - 1000000000L))
    assert(longEscapes.isEmpty,
      s"near-dups of >=20-token docs escaped LSH: $longEscapes")
    assert(nearSurvivors.size * 10 <= inBand(ids(st.aug), 1000000000L).size,
      s"more than 10% of near-dups escaped: $nearSurvivors")
  }

  test("decontamination removes the eval shard and eval-quoting docs") {
    val survivors = ids(st.afterDecontam)
    def shard20(id: Long): Long = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          id.toString.getBytes("UTF-8")).substring(0, 15), 16)
      h % 20
    }
    // no eval-shard member survives into training data
    val evalIds = survivors.filter(shard20(_) < 2)
    assert(evalIds.isEmpty, s"eval-shard docs leaked into training: $evalIds")
    // every surviving quote doc quotes a TRAIN base doc — quotes of
    // eval docs are contaminated (≥20% shared shingles) and dropped
    // every surviving quote whose base doc (a) reached stage 4 as a
    // survivor (its shingles feed the eval set) and (b) sits in the
    // eval shard must have been dropped as contaminated. A quote of a
    // base that was itself deduped away earlier is legitimately clean
    // — its shingles never entered the eval set.
    val s4Ids = ids(st.afterNearDedup)
    val quoteSurvivors = inBand(survivors, 7000000000L)
    val badQuotes = quoteSurvivors.filter { q =>
      val base = q - 7000000000L
      s4Ids(base) && shard20(base) < 2
    }
    assert(badQuotes.isEmpty,
      s"quotes of surviving eval docs escaped decontamination: $badQuotes")
  }

  test("packed offsets are exact per-shard prefix sums of survivor token counts") {
    val rows = st.packed
      .select(col("shard"), col("n_tokens"), col("offset_toks"),
        col("pack_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      var acc = 0L
      sorted.foreach { case (_, n, off, seq) =>
        assert(off == acc, s"offset $off != running sum $acc")
        assert(seq == off / 256)
        acc += n
      }
    }
  }

  test("incremental refresh: cross re-fetch plants die against state; the retro-contam sweep engages") {
    val docs = graft.Tables.documents(spark, sf)
    val inc = CorpusPipeline.buildIncrementalStages(docs)
    val cut = docs.agg((max(col("doc_id")) * 4L).as("m"))
      .head().getLong(0) / 5L
    val packedIds = ids(inc.packed)
    // the exact-text (+8e9) and messy-URL (+12e9) re-fetches of base
    // pages must ALL die against the persisted key state — one
    // surviving means a state probe silently stopped engaging
    assert(inBand(packedIds, 8000000000L).isEmpty,
      "an exact re-fetch of a base page survived the text-key state")
    assert(inBand(packedIds, 12000000000L).isEmpty,
      "a messy-URL re-fetch of a base page survived the URL-key state")
    // near-dup re-fetches (+9e9) whose base original's signature is in
    // the persisted table die too; allow only copies whose original
    // never reached the signature state (dropped before near-dedup)
    val sigDocs = ids(CorpusPipeline.build(
      docs.filter(col("doc_id") <= cut)).afterExactDedup)
    val nearSurvivors = inBand(packedIds, 9000000000L)
    assert(nearSurvivors.forall(id => !sigDocs.contains(id - 9000000000L)),
      s"near-dup re-fetches of signature-state docs survived: " +
        s"${nearSurvivors.take(5)}")
    // the RETRO-contamination sweep engages on this corpus: new eval
    // shingles arriving with the increment really do retract base
    // survivors (a vacuous sweep would pass the oracle trivially)
    val retro = ids(inc.retroContam)
    assert(retro.nonEmpty, "retro-contamination sweep never engaged")
    // and it only ever retracts BASE-side ids — increment docs are
    // handled by the increment's own contamination stage
    assert(retro.forall(id =>
        id <= cut || (id >= 1000000000L && id % 1000000000L <= cut)),
      s"retro sweep retracted non-base ids: ${retro.take(5)}")
    // retracted docs really leave the packed survivor set
    assert(retro.intersect(packedIds).isEmpty,
      "a retro-retracted doc still appears in the packed output")
  }
}
