package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter as a mergeable typed Aggregator — the compact
  * set-membership sketch behind every "have I seen this key" pass that
  * can't afford the exact set (Bloom, CACM 1970; the pre-probe
  * [[Contamination]] documents as its beyond-broadcast fallback, and
  * the shape CCNet/Dolma-style curation uses for cross-shard URL and
  * document dedup).
  *
  * The filter is a fixed m-bit bitset packed into m/64 longs. Bit
  * positions come from Kirsch–Mitzenmacher double hashing (ESA 2006:
  * two hash values simulate any k with no independence loss) off the
  * SAME oracle-portable 60-bit md5 hash the dedup family uses
  * ([[Dedup.md5Hash60]]):
  *
  *   h1 = h mod m,   h2 = 2·((h >> 20) mod 2¹⁹) + 1   (odd ⇒ full-cycle)
  *   pos_i = (h1 + i·h2) mod m,  i ∈ [0, k)
  *
  * — pure integer arithmetic, so the probe's exact hit set is
  * reproducible in any engine with md5 + shifts (the DuckDB oracle
  * evaluates the SAME positions relationally: a key bloom-hits iff all
  * k of its positions appear in the distinct position set of the
  * build side). No false negatives ever; false positives at the
  * classic (1 − e^(−kn/m))^k rate, spec-bounded (BloomSpec).
  *
  * 100 TB shape: partial aggregation ORs per-partition bitsets
  * map-side, only m/64-long words cross the exchange, and the finished
  * filter (m/8 bytes — 128 KiB at the default 2²⁰ bits) broadcasts to
  * every executor so the probe side rides its scan: membership for a
  * corpus-sized stream against a set that would never broadcast as
  * rows. Sizing: m ≈ 1.44·k·n/ln 2 bits for the target FP rate — the
  * default 2²⁰/k=3 holds ~10⁵ keys at <2% FP; scale m with the build
  * side, the probe cost is k array reads either way.
  */
object Bloom {

  /** Default filter width in bits (must be a multiple of 64). */
  val DefaultM: Int = 1 << 20

  /** Default number of hash functions. */
  val DefaultK: Int = 3

  private val H2Mod = 524288L // 2^19

  /** JVM-side bit positions — bit-identical to [[bitPositions]]. */
  def positions(h: Long, m: Int, k: Int): Array[Int] = {
    val h1 = java.lang.Math.floorMod(h, m.toLong)
    val h2 = 2L * java.lang.Math.floorMod(h >> 20, H2Mod) + 1L
    Array.tabulate(k)(i =>
      java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt)
  }

  /** Column-side bit positions for a 60-bit hash column (codegen'd
    * built-ins, unrolled over the k hash functions). */
  def bitPositions(h: Column, m: Int, k: Int): Seq[Column] = {
    val h1 = pmod(h, lit(m.toLong))
    val h2 = lit(2L) * pmod(shiftright(h, 20), lit(H2Mod)) + lit(1L)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m.toLong)))
  }

  /** Mergeable bitset aggregator over 60-bit hash inputs. Buffer and
    * result are the packed word array; reduce sets k bits, merge ORs
    * word-wise — both O(1) per input beyond the fixed buffer, so the
    * partial/final split ships only bitsets across the exchange. */
  class BloomAgg(m: Int = DefaultM, k: Int = DefaultK)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Array[Long] = new Array[Long](m / 64)

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val ps = positions(h, m, k)
      var i = 0
      while (i < ps.length) {
        b(ps(i) >>> 6) |= 1L << (ps(i) & 63)
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Untyped aggregate column building the filter from a LONG hash
    * column: `df.agg(Bloom.agg()(col("h")))` → one array<bigint> row. */
  def agg(m: Int = DefaultM, k: Int = DefaultK): Column => Column =
    udaf(new BloomAgg(m, k), Encoders.scalaLong).apply(_)

  /** Membership probe against a packed filter column: true iff all k
    * bit positions of `h` are set. The variable shift amount forces
    * the SQL `shiftright(base, expr)` form (`call_function` — the
    * Scala wrapper only takes literal shift counts); still built-in
    * codegen'd arithmetic, k array reads per row. */
  def mightContain(words: Column, h: Column, m: Int = DefaultM,
      k: Int = DefaultK): Column =
    bitPositions(h, m, k).map { p =>
      val word = element_at(words, shiftright(p, 6).cast("int") + 1)
      call_function("shiftright", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** [[Contamination.check]] with the documented beyond-broadcast
    * fallback made real: the eval shingle set is folded into a Bloom
    * filter (m/8 bytes however many shingles) and the train side is
    * pre-probed against it alongside the exact join, quantifying the
    * false-positive overcount the pre-probe would admit. Output adds
    * `n_bloom_hits` (≥ n_contam always — no false negatives) to the
    * contamination columns.
    *
    * At 100 TB the filter REPLACES the broadcast row set: probe
    * map-side, then resolve only the hits (exact + FPs, a tiny
    * fraction) through the join — the train side never shuffles and
    * the join input shrinks from every shingle to bloom-positive
    * shingles only. Here both paths run so the oracle checks the FP
    * arithmetic itself.
    */
  def contamPreProbe(docs: DataFrame, id: Column, text: Column,
      nShards: Int = 20, evalKeep: Int = 2, n: Int = 3,
      m: Int = DefaultM, k: Int = DefaultK): DataFrame = {
    // One shared derivation with Contamination.check — both probes
    // must always measure the SAME eval/train split and shingle hash.
    val rows = Contamination.shingleShardRows(docs, id, text, nShards, n)
    // The eval hash set feeds BOTH the filter build and the exact
    // join — materialize it once (it is the bounded side: an eval
    // suite is thousands of docs at any corpus scale, and without
    // this each consumer re-derives every corpus shingle).
    val evalSh = rows.filter(col("shard") < evalKeep)
      .select(col("sh")).distinct().localCheckpoint(true)
    val filterRow = evalSh.agg(agg(m, k)(col("sh")).as("bloom"))
    val train = rows.filter(col("shard") >= evalKeep)
      .select(col("doc"), col("sh")).distinct()
    train.crossJoin(broadcast(filterRow))
      .join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("sh"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contam"),
        sum(mightContain(col("bloom"), col("sh"), m, k).cast("long"))
          .as("n_bloom_hits"))
      .select(col("doc").as("doc_id"), col("n_shingles"), col("n_contam"),
        col("n_bloom_hits"))
  }
}
