package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
  * (SURVEY §7.5). Each designed for the 100 TB shape:
  *
  *  - exact: one hash-shuffle on the normalized key; map-side combine
  *    collapses duplicates before the exchange.
  *  - MinHash: signatures + band hashes are computed per-row with
  *    higher-order functions (transform/aggregate over the shingle
  *    array) — zero shuffle until the band-bucket self-join, which
  *    shuffles only (doc_id, band) pairs, never text. Candidate
  *    verification compares 32-long signatures, not documents.
  *  - SimHash: one explode + 64-column sum aggregate per doc; Hamming
  *    pairs via bit_count(xor) on 8-byte keys.
  */
object Dedup {

  /** Exact dedup: canonical row per normalized text. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(lower(trim(text)).as("norm_text"))
      .agg(min(id).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val NumHashes = 32
  val RowsPerBand = 4
  val NumBands: Int = NumHashes / RowsPerBand

  /** MinHash signature as a per-row expression: per hash function i,
    * min over shingles of xxhash64(i, shingle).
    *
    * NOTE: higher-order functions are interpreted (CodegenFallback) and
    * the outer lambda re-evaluates `shingleArr` for every i — fine for
    * small arrays / ad-hoc use; the bulk pipeline uses
    * [[minhashSignatures]] (explode + codegen'd hash aggregate) instead. */
  def minhashSignature(shingleArr: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)),
      i => array_min(transform(shingleArr, s => xxhash64(i, s))))

  /** Bulk MinHash signatures: shingle rows via posexplode + lead window
    * (everything in whole-stage codegen — the per-row higher-order
    * shingle builder is interpreted and ~3× slower in bulk), then the 32
    * seeded hashes per shingle, then per-doc minima in one partial+final
    * HashAggregate. Shuffle volume: tokens once (for the lead window),
    * then one 32-long row per doc (map-side combined). */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // Universal-hash family over ONE string hash per shingle: h_i =
    // xxhash64(i, xxhash64(s)). Hashing the 8-byte base 32× is far
    // cheaper than hashing the string 32×; same collision behavior.
    val sh = shingleRows(docs, id, text, 3)
      .select(col("doc"), xxhash64(col("s")).as("hs"))
    val mins = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("hs"))).as(s"h$i"))
    sh.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** One row per word n-gram shingle: (doc, s). posexplode + lead keeps
    * shingle assembly in codegen; the window shuffle partitions by doc. */
  def shingleRows(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(id.as("doc"),
      posexplode(TextOps.tokens(text)).as(Seq("pos", "w")))
    val win = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val leads = (1 until n).map(k => lead(col("w"), k).over(win).as(s"w$k"))
    toks.select(col("doc") +: col("w") +: leads: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc"),
        concat_ws(" ", col("w") +: (1 until n).map(k => col(s"w$k")): _*).as("s"))
  }

  /** LSH band hashes: hash each contiguous run of RowsPerBand signature
    * entries; docs sharing any band hash become candidate pairs. */
  def bandHashes(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)),
      b => xxhash64(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))))

  /** Estimated Jaccard from two signatures: fraction of equal entries. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / NumHashes

  /** Candidate near-dup pairs via MinHash LSH.
    *
    * @param docs (id, text) frame
    * @return (doc_a, doc_b, est_jaccard) with doc_a < doc_b, distinct
    */
  def minhashPairs(docs: DataFrame, id: Column, text: Column, threshold: Double): DataFrame = {
    // Signatures are materialized before the self-join so neither join
    // side (nor the verify stage) re-derives them from text. The frame
    // is tiny (id + 32 longs); at 100 TB it would be a persisted
    // signature table refreshed incrementally.
    val base = minhashSignatures(docs, id, text).persist()
    base.count() // eager: both join subtrees must read the cache, not race to fill it
    val banded = base
      .select(col("doc"), col("sig"), posexplode(bandHashes(col("sig"))).as(Seq("band", "bh")))
    val a = banded.select(col("doc").as("doc_a"), col("sig").as("sig_a"), col("band"), col("bh"))
    val b = banded.select(col("doc").as("doc_b"), col("sig").as("sig_b"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash per document from whitespace tokens: per bit j,
    * sign of sum over tokens of ±1 by bit j of xxhash64(token).
    * One explode + grouped sum; bit columns reassembled with
    * shiftleft/bitwise-or. */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tokenized = docs.select(id.as("doc"),
      explode(TextOps.tokens(text)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    val summed = tokenized.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    summed.select(col("doc"), sh.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Collapse near-dup candidate pairs into dedup groups: connected
    * components by iterative min-label propagation (the Pregel pattern
    * as DataFrame joins). Each iteration is one shuffle join; lineage is
    * truncated per step with an eager localCheckpoint so plans don't
    * grow with the iteration count. Converges in O(component diameter)
    * iterations — near-dup components are shallow (pairs chain through
    * shared docs), so `maxIter` ~10 is generous.
    *
    * @param pairs (a, b) undirected candidate edges
    * @return (node, group) — group = min doc id reachable
    */
  def dedupGroups(pairs: DataFrame, a: Column, b: Column, maxIter: Int = 10): DataFrame = {
    // materialize the (possibly expensive) pair source once — the
    // undirected union below references it twice
    val p = pairs.select(a.as("pa"), b.as("pb")).localCheckpoint()
    val edges = p.select(col("pa").as("src"), col("pb").as("dst"))
      .union(p.select(col("pb").as("src"), col("pa").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("group", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("group")).as("ngroup"))
      val updated = labels
        .join(neighborMin, col("node") === col("src"), "left")
        .select(col("node"),
          least(col("group"), coalesce(col("ngroup"), col("group"))).as("group"))
        .localCheckpoint()
      val changed = updated.as("u")
        .join(labels.select(col("node"), col("group").as("old")), "node")
        .filter(col("group") =!= col("old")).count()
      labels = updated
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Exact word-level n-gram Jaccard between paired docs (set
    * semantics: distinct shingles). */
  def ngramJaccard(shinglesA: Column, shinglesB: Column): Column = {
    val inter = size(array_intersect(shinglesA, shinglesB))
    val union = size(array_distinct(concat(shinglesA, shinglesB)))
    round(inter.cast("double") / union, 4)
  }
}
