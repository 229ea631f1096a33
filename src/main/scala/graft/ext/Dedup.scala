package graft.ext

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
  * (SURVEY §7.5). Each designed for the 100 TB shape:
  *
  *  - exact: one hash-shuffle on the normalized key; map-side combine
  *    collapses duplicates before the exchange.
  *  - MinHash: signatures via one explode + codegen'd hash aggregate —
  *    zero extra shuffle until the band-bucket self-join, which shuffles
  *    only (doc_id, band) pairs, never text. Candidate verification
  *    compares 32-long signatures, not documents.
  *  - SimHash: one explode + 64-column sum aggregate per doc; Hamming
  *    pairs via bit_count(xor) on 8-byte keys.
  *
  * Hash family: every hash is derived from md5 (`conv(substr(md5(x),
  * 1,15),16,10)` — a uniform 60-bit value) rather than xxhash64, so the
  * whole pipeline is reproducible in any engine with md5 + hex→int
  * (DuckDB: `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) and the driver
  * gets exact cross-engine oracles for minhash/simhash/groups.
  */
object Dedup {

  /** Oracle-portable 60-bit hash of a string column: the first 15 hex
    * chars of md5, read as an integer. Positive (< 2^60), uniform. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Exact dedup: canonical row per normalized text. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(lower(trim(text)).as("norm_text"))
      .agg(min(id).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  val NumHashes = 32
  val RowsPerBand = 4
  val NumBands: Int = NumHashes / RowsPerBand
  // 32 hashes from 8 md5 digests: each digest's 32 hex chars yield four
  // 8-hex (32-bit) hash values. Fixed-width lowercase hex compares
  // lexicographically == numerically, so minima are taken on the raw
  // hex slices (one byte-compare per row) and converted to integers
  // once per doc — not once per shingle.
  private val NumDigests: Int = NumHashes / 4
  private val HexPerHash = 8

  /** Hash k of a shingle string: hex slice k%4 of md5(s"${k/4}:" + s). */
  private def hashSliceOf(digest: Column, k: Int): Column =
    substring(digest, 1 + (k % 4) * HexPerHash, HexPerHash)

  /** MinHash signature as a per-row expression — same family as
    * [[minhashSignatures]].
    *
    * NOTE: higher-order functions are interpreted (CodegenFallback) and
    * the outer lambda re-evaluates `shingleArr` for every k — fine for
    * small arrays / ad-hoc use; the bulk pipeline uses
    * [[minhashSignatures]] (explode + codegen'd hash aggregate) instead. */
  def minhashSignature(shingleArr: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)), k =>
      conv(array_min(transform(shingleArr, s =>
        md5(concat((k / 4).cast("string"), lit(":"), s).cast("binary"))
          .substr((k % 4) * HexPerHash + 1, lit(HexPerHash)))), 16, 10)
        .cast("long"))

  /** Bulk MinHash signatures: shingle rows via posexplode + lead window
    * (everything in whole-stage codegen — the per-row higher-order
    * shingle builder is interpreted and ~3× slower in bulk), then 8
    * seeded md5 digests per shingle (four 32-bit hashes each), then
    * per-doc minima in one partial+final HashAggregate over fixed-width
    * hex slices. Shuffle volume: tokens once (for the lead window),
    * then one 32-entry row per doc (map-side combined). */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val sh = shingleRows(docs, id, text, 3)
    val digests = sh.select(col("doc") +:
      (0 until NumDigests).map(i =>
        md5(concat(lit(s"$i:"), col("s")).cast("binary")).as(s"m$i")): _*)
    val mins = (0 until NumHashes).map { k =>
      min(hashSliceOf(col(s"m${k / 4}"), k)).as(s"h$k")
    }
    digests.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until NumHashes).map(k =>
          conv(col(s"h$k"), 16, 10).cast("long")): _*).as("sig"))
  }

  /** One row per word n-gram shingle: (doc, s). posexplode carries the
    * doc's token array alongside each position so the n-gram is
    * assembled with element_at — fully map-side, whole-stage codegen,
    * ZERO shuffle (an earlier lead()-window formulation shuffled and
    * sorted every token by doc; nothing here needs cross-row state).
    * Docs with fewer than n tokens yield no rows. */
  def shingleRows(docs: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    docs.select(id.as("doc"), TextOps.tokens(text).as("toks"))
      .select(col("doc"), col("toks"), posexplode(col("toks")).as(Seq("pos", "w")))
      .filter(col("pos") <= size(col("toks")) - n)
      .select(col("doc"), concat_ws(" ",
        (0 until n).map(k => element_at(col("toks"), col("pos") + k + 1)): _*).as("s"))

  /** LSH band hashes: md5 of each contiguous run of RowsPerBand
    * signature entries (comma-joined decimal strings — the same bytes
    * any engine derives); docs sharing any band hash become candidate
    * pairs. */
  def bandHashes(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)), b =>
      md5(array_join(
        transform(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand)),
          x => x.cast("string")), ",").cast("binary")))

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
    // signature table refreshed incrementally. Eager localCheckpoint —
    // not persist() — so the blocks are owned by the RDD and freed by
    // the ContextCleaner once the result is consumed (round-1's
    // persist()-and-never-unpersist here leaked into every later query
    // in shared sessions).
    val base = minhashSignatures(docs, id, text).localCheckpoint(true)
    // Candidate generation shuffles only (doc, band, band-hash) — the
    // 32-entry signatures do NOT ride through the self-join (a doc
    // colliding in all 8 bands would ship its signature 8× per
    // partner). Distinct-ing the bare id pairs first also means the
    // Jaccard estimate runs once per unique pair, not once per
    // colliding band.
    val banded = base
      .select(col("doc"), posexplode(bandHashes(col("sig"))).as(Seq("band", "bh")))
    val cand = banded.select(col("doc").as("doc_a"), col("band"), col("bh"))
      .join(banded.select(col("doc").as("doc_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(base.select(col("doc").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash per document from whitespace tokens: per bit j,
    * sign of sum over tokens of ±1 by bit j of the token's md5.
    * Bit j lives in hex nibble j/4 of the digest (16 nibble columns
    * decoded once per token, then 64 codegen'd bit sums in one
    * partial+final HashAggregate); bit columns reassembled with
    * bitwise-or of Scala-constant powers of two. */
  def simhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tokenized = docs.select(id.as("doc"),
      explode(TextOps.tokens(text)).as("tok"))
      .withColumn("hx", md5(col("tok").cast("binary")))
    val nibbles = tokenized.select(col("doc") +:
      (0 until 16).map(p =>
        conv(substring(col("hx"), p + 1, 1), 16, 10).cast("int").as(s"n$p")): _*)
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col(s"n${j / 4}"), j % 4).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val summed = nibbles.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map { j =>
      // 1L << 63 is Long.MinValue — the two's-complement high bit, the
      // same value the oracle adds as (-9223372036854775807 - 1)
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    summed.select(col("doc"), sh.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Collapse near-dup candidate pairs into dedup groups (connected
    * components): GraphX `connectedComponents` — Pregel min-label
    * propagation with per-superstep caching and cleanup handled by the
    * library. This is the 100 TB path: each superstep is one co-
    * partitioned join, state is O(vertices), and intermediate blocks are
    * unpersisted as supersteps retire (round 1's hand-rolled DataFrame
    * loop ran two driver-blocking jobs per iteration and pinned every
    * iteration's localCheckpoint — 50 s at sf0.1 on <1 MB of edges).
    *
    * @param pairs (a, b) undirected candidate edges
    * @return (node, group) — group = min doc id reachable
    */
  def dedupGroups(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val p = pairs.select(a.cast("long"), b.cast("long")).as[(Long, Long)]
      .localCheckpoint(true)
    // Partition the graph by edge volume, not by the session default:
    // Pregel pays per-superstep scheduling for every partition, so a
    // 600-edge candidate graph on 32 partitions is all overhead. ~50k
    // edges per partition; a 100 TB corpus' edge set gets the full
    // parallelism.
    val nEdges = p.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 50000L + 1L)).toInt
    val edgeRdd = p.rdd.map { case (x, y) => Edge(x, y, ()) }.coalesce(parts)
    val graph = Graph.fromEdges(edgeRdd, ())
    val cc = graph.connectedComponents()
    // Materialize the labels, then release every graph-side RDD — the
    // result must not keep Pregel's cached blocks alive in the session.
    val out = spark.createDataFrame(cc.vertices.map { case (n, g) => (n, g) })
      .toDF("node", "group").localCheckpoint(true)
    cc.unpersist(blocking = false)
    graph.unpersist(blocking = false)
    out
  }

  /** Pure-DataFrame connected components (iterative min-label
    * propagation), for engines/sessions without GraphX. One
    * driver-blocking job per iteration: the convergence count runs over
    * the just-persisted update (cache fill and count share the job),
    * and the previous iteration's cache is unpersisted immediately —
    * storage stays O(2 label frames) regardless of iteration count.
    *
    * @return (node, group); logs a warning if maxIter hit before
    *         convergence (labels would be split groups, never silent)
    */
  def dedupGroupsDF(pairs: DataFrame, a: Column, b: Column, maxIter: Int = 20): DataFrame = {
    val p = pairs.select(a.as("pa"), b.as("pb")).localCheckpoint(true)
    val edges = p.select(col("pa").as("src"), col("pb").as("dst"))
      .union(p.select(col("pb").as("src"), col("pa").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("group", col("node"))
    var cached: Option[DataFrame] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"))
        .agg(min(col("group")).as("ngroup"))
      val updated = labels.select(col("node"), col("group").as("old"))
        .join(neighborMin, col("node") === col("src"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("ngroup"), col("old"))).as("group"))
        .persist()
      // ONE action: fills `updated`'s cache and counts changed labels
      val changed = updated.filter(col("group") =!= col("old")).count()
      cached.foreach(_.unpersist(blocking = false))
      cached = Some(updated)
      labels = updated.select(col("node"), col("group"))
      converged = changed == 0
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] dedupGroupsDF: NOT converged after $maxIter iterations — " +
          "labels may split components; raise maxIter")
    val out = labels.localCheckpoint(true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** Exact word-level n-gram Jaccard between paired docs (set
    * semantics: distinct shingles). */
  def ngramJaccard(shinglesA: Column, shinglesB: Column): Column = {
    val inter = size(array_intersect(shinglesA, shinglesB))
    val union = size(array_distinct(concat(shinglesA, shinglesB)))
    round(inter.cast("double") / union, 4)
  }
}
