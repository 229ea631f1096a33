package graft.ext.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All 32 MinHash hash values of one shingle in a single pass.
  *
  * Semantics are IDENTICAL to the built-in formulation the DuckDB
  * oracle replicates —
  * `CAST('0x' || substr(md5(i || ':' || s), 1+(k%4)*8, 8) AS BIGINT)`
  * for digest i = k/4 — hash k is bytes [4·(k%4), 4·(k%4)+4) of
  * digest i read big-endian (hex chars and raw bytes agree on that).
  *
  * Why an Expression instead of md5/substr/conv columns (measured on
  * the 10× probe, thread dumps in SCALE.md):
  *  - the built-in md5 calls `MessageDigest.getInstance` per ROW per
  *    digest — JCA provider lookup + constraint check + reflective
  *    construction ~80 M times; here one thread-local digest instance
  *    is reset and reused;
  *  - no hex-encode→substr→hex-parse round trip (DigestUtils encodes
  *    128 bits to 32 chars, conv parses them back) — bytes are read
  *    directly;
  *  - emitting LONGS keeps the downstream 32-way min() in a
  *    HashAggregate; min() over hex *strings* silently fell back to
  *    SortAggregate (string buffers aren't hash-aggregable), sorting
  *    every shingle row.
  *
  * CodegenFallback is deliberate: per-row dispatch overhead (~100 ns)
  * is noise against 8 md5 computations (~µs), unlike the interpreted
  * higher-order functions this engine avoids in hot paths, where the
  * per-ELEMENT lambda dispatch dominated.
  */
case class MinhashDigests(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_digests"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Long](MinhashDigests.NumHashes)
    val md = MinhashDigests.digests.get()
    var i = 0
    while (i < MinhashDigests.NumDigests) {
      md.reset()
      md.update(MinhashDigests.prefixes(i))
      md.update(s)
      val d = md.digest()
      var j = 0
      while (j < 4) {
        out(i * 4 + j) =
          ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashDigests =
    copy(child = newChild)
}

object MinhashDigests {
  val NumHashes = 32
  val NumDigests = 8

  private[expr] val prefixes: Array[Array[Byte]] =
    Array.tabulate(NumDigests)(i => s"$i:".getBytes("UTF-8"))

  private[expr] val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Column factory: 32 hash values (array<long>) of a shingle. */
  def hashes(s: Column): Column =
    ColumnBridge.column(MinhashDigests(ColumnBridge.expression(s)))
}

/** The WHOLE 32-long MinHash signature of a shingle array in one eval:
  * per-component minima of [[MinhashDigests]] over every shingle,
  * fused into a single tight loop. Identical values to both the bulk
  * explode+aggregate path (`Dedup.minhashSignatures`) and the
  * column-built per-row form (`Dedup.minhashSignature`) — DedupSpec
  * pins all three to one hash family. This is the per-row STREAMING
  * path (stream.NearDup): the column form's interpreted
  * transform + 32 × array_min wrapper paid per-element lambda
  * dispatch on every comparison; here the mins fold inside the digest
  * loop. Null for an empty shingle array (no windows → no signature —
  * callers route sub-shingle docs around the LSH stage). */
case class MinhashSignature(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature_kernel"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(MinhashDigests.NumHashes)(Long.MaxValue)
    val md = MinhashDigests.digests.get()
    var r = 0
    while (r < n) {
      val s = arr.getUTF8String(r).getBytes
      var i = 0
      while (i < MinhashDigests.NumDigests) {
        md.reset()
        md.update(MinhashDigests.prefixes(i))
        md.update(s)
        val d = md.digest()
        var j = 0
        while (j < 4) {
          val v = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          val k = i * 4 + j
          if (v < mins(k)) mins(k) = v
          j += 1
        }
        i += 1
      }
      r += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  /** Column factory: full signature (array<long>, null if no shingles). */
  def of(shingles: Column): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(shingles)))
}

/** First 8 bytes of md5(s) as a big-endian long — the 16 hex nibbles
  * SimHash consumes, without the per-row `MessageDigest.getInstance`
  * and hex round trip. Nibble p (= hex char p+1 of the md5 string) is
  * `(value >>> (4*(15-p))) & 0xf`. */
case class Md5Prefix64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(input: Any): Any = {
    val md = MinhashDigests.digests.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  def of(s: Column): Column =
    ColumnBridge.column(Md5Prefix64(ColumnBridge.expression(s)))
}

/** The whole 32-long MinHash signature straight from a TOKEN array —
  * the bulk-path fusion of [[ShingleMd5]]'s window-byte streaming and
  * [[MinhashSignature]]'s min-fold (round 21, guide §1.2 step 2 +
  * §2.4): one JVM call per DOC replaces explode(shingleRows) →
  * per-shingle [[MinhashDigests]] → 32-way min HashAggregate — no
  * per-shingle row materialization, no shingle-string build, no
  * aggregate, and the per-doc exchange disappears (the signature rides
  * the scan). Hash family identical: for every w-window the digested
  * bytes are exactly `"{i}:" + tok₁ + ' ' + … + tokw` — the bytes
  * `MinhashDigests` hashes for the joined shingle string — and hash
  * k = i·4+j is bytes [4j, 4j+4) of digest i big-endian. Duplicate
  * windows are min-idempotent, so window multiset ≡ distinct-shingle
  * semantics. Null when the array has < w tokens (no windows), matching
  * the explode path's emit-no-row; callers filter the nulls.
  * CodegenFallback for the same measured reason as [[MinhashDigests]]:
  * per-row dispatch is noise against 8·windows md5 computations. */
case class MinhashSigTokens(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < w) return null
    val bytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) { bytes(t) = toks.getUTF8String(t).getBytes; t += 1 }
    val mins = Array.fill(MinhashDigests.NumHashes)(Long.MaxValue)
    val md = MinhashDigests.digests.get()
    val space = Array[Byte](' ')
    var p = 0
    while (p <= n - w) {
      var i = 0
      while (i < MinhashDigests.NumDigests) {
        md.reset()
        md.update(MinhashDigests.prefixes(i))
        var k = p
        while (k < p + w) {
          if (k > p) md.update(space)
          md.update(bytes(k))
          k += 1
        }
        val d = md.digest()
        var j = 0
        while (j < 4) {
          val v = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          val h = i * 4 + j
          if (v < mins(h)) mins(h) = v
          j += 1
        }
        i += 1
      }
      p += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigTokens =
    copy(child = newChild)
}

object MinhashSigTokens {
  /** Column factory: full signature from a token array (null when the
    * array holds fewer than `w` tokens). */
  def of(toks: Column, w: Int): Column =
    ColumnBridge.column(MinhashSigTokens(ColumnBridge.expression(toks), w))
}
