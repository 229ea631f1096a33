package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine known answers: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(2f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 3f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0)
    ).toDF("a", "b", "expect")
    val bad = df.filter(abs(VectorOps.cosine(col("a"), col("b")) - col("expect")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("codegen cosine matches the higher-order formulation exactly") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q).select(
      VectorOps.cosine(col("embedding"), col("qv")).as("hof"),
      VectorOps.cosineFast(col("embedding"), col("qv")).as("gen"))
    assert(both.filter(abs(col("hof") - col("gen")) > 1e-12).count() == 0)
  }

  test("codegen long dot/dist2 match the higher-order formulation exactly") {
    // idot/idist2 are now LongDot codegen kernels; this pins them to
    // the interpreted aggregate(zip_with(...)) reference they replaced
    // (including negative components and length-mismatch truncation).
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    def hofDist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val qa = VectorOps.quantize1000(col("embedding").cast("array<double>"))
    val qb = VectorOps.quantize1000(
      transform(col("embedding").cast("array<double>"), x => -x * 2 + lit(0.25)))
    val emb = graft.Tables.embeddings(spark, sf)
      .select(qa.as("a"), qb.as("b"))
    val bad = emb.select(
      VectorOps.idot(col("a"), col("b")).as("gen_dot"),
      hofDot(col("a"), col("b")).as("hof_dot"),
      VectorOps.idist2(col("a"), col("b")).as("gen_d2"),
      hofDist2(col("a"), col("b")).as("hof_d2"))
      .filter(col("gen_dot") =!= col("hof_dot") || col("gen_d2") =!= col("hof_d2"))
    assert(bad.count() == 0)
    // Length mismatch: the kernel truncates to the shorter side (the
    // HOF would null-pad via zip_with and return NULL — for the
    // equal-length quantized vectors every caller passes, the two
    // never diverge; this pins the kernel's own documented behavior).
    val short = Seq((Array(2L, 3L), Array(10L, 20L, 30L))).toDF("a", "b")
      .select(VectorOps.idot(col("a"), col("b")).as("d"))
    assert(short.head.getLong(0) == 80L)
  }

  test("pq codes: full coverage, codes in range, codebook self-encodes at zero error") {
    val pq = graft.SparkEntry.queries("pq_codes")(spark, sf)
    val nVec = graft.Tables.embeddings(spark, sf).count()
    assert(pq.count() == nVec * 8, "one row per (vector, subspace)")
    assert(pq.filter(col("code") < 0 || col("code") >= 16).count() == 0)
    assert(pq.filter(col("d2") < 0).count() == 0)
    // the 16 hash-sampled codebook vectors contain their own
    // sub-vectors, so they encode with d2 = 0 in every subspace
    val zeroTotal = pq.groupBy(col("vec_id"))
      .agg(sum(col("d2")).as("tot")).filter(col("tot") === 0).count()
    assert(zeroTotal >= 16, s"codebook members must self-encode, got $zeroTotal")
  }

  test("shingle_md5 kernel matches the HOF md5Hash60-over-shingles formulation exactly") {
    import graft.ext.{Dedup, TextOps}
    val docs = graft.Tables.documents(spark, sf).limit(200)
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
    val both = docs.select(col("doc_id"),
        graft.ext.expr.ShingleMd5.shingleMd5(col("toks"), 8).as("fast"),
        transform(TextOps.shingles(col("toks"), 8),
          w => Dedup.md5Hash60(w)).as("ref"))
    assert(both.filter(not(col("fast") <=> col("ref"))).isEmpty,
      "kernel and HOF window hashes must be bit-identical")
    // short arrays yield empty, exactly like shingles' empty branch
    val short = Seq(Seq("a", "b")).toDF("toks")
      .select(graft.ext.expr.ShingleMd5.shingleMd5(col("toks"), 8).as("h"))
    assert(short.head().getSeq[Long](0).isEmpty)
  }

  test("pq ADC search: self-retrieval at exact_d2 0, rerank order total, ADC consistent with codes+LUT") {
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.quantize1000(
        col("embedding").cast("array<double>")).as("q"))
    val out = VectorOps.pqSearchTopK(
      corpus, corpus.filter(col("vec_id") === 0), k = 10).collect()
    assert(out.length == 10)
    // The query is a corpus member: exact distance 0, ranked first.
    assert(out.head.getLong(0) == 0L && out.head.getLong(2) == 0L)
    val exacts = out.map(_.getLong(2)).toSeq
    assert(exacts == exacts.sorted, "rerank must order by exact distance")
    // ADC distances agree with an independent per-vector recomputation:
    // Σ_sub d2(query sub-vector, assigned codeword sub-vector).
    val cb = VectorOps.pqCodebook(corpus).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val qv = corpus.filter(col("vec_id") === 0)
      .head().getSeq[Long](1).toArray
    val codes = VectorOps.pqEncode(corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    def sub(a: Array[Long], s: Int) = a.slice(s * 8, s * 8 + 8)
    for (r <- out) {
      val expected = (0 until 8).map { s =>
        val cw = sub(cb(codes((r.getLong(0), s))), s)
        sub(qv, s).zip(cw).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
      assert(r.getLong(1) == expected,
        s"ADC mismatch for vec ${r.getLong(0)}: ${r.getLong(1)} != $expected")
    }
  }

  test("pqTrainCodebook: refinement lowers quantization error; trained ADC recall ≥ sampled") {
    // Planted neighbors (the ann_recall move): 10 perturbed copies of
    // vec 0 make the true top-11 for query 0 known by construction.
    val emb = graft.Tables.embeddings(spark, sf)
    val plant = emb.filter(col("vec_id") === 0)
      .select(col("embedding"), explode(sequence(lit(1), lit(10))).as("j"))
      .select((lit(9000L) + col("j")).as("vec_id"),
        transform(col("embedding"),
          x => (x + col("j") * lit(0.0001)).cast("float")).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .unionByName(plant)
      .select(col("vec_id"), VectorOps.quantize1000(
        col("embedding").cast("array<double>")).as("q"))
      .localCheckpoint(true)
    val sampledCb = VectorOps.pqCodebook(corpus).localCheckpoint(true)
    val trainedCb = VectorOps.pqTrainCodebook(corpus).localCheckpoint(true)
    // The per-subspace k-means objective: total encode error must not
    // increase under the Lloyd-refined codebooks.
    def err(cb: org.apache.spark.sql.DataFrame) =
      VectorOps.pqEncodeWith(corpus, cb, 8, 8)
        .agg(sum(col("d2"))).head().getLong(0)
    val (se, te) = (err(sampledCb), err(trainedCb))
    assert(te <= se, s"trained total d2 $te > sampled $se")
    // ADC recall at rerank = k (no rerank slack, so candidate quality
    // is what's measured): trained must not trail sampled.
    val truth = (Set(0L) ++ (1 to 10).map(j => 9000L + j)).toSet
    def hits(cb: org.apache.spark.sql.DataFrame) = {
      val codes = VectorOps.pqCodesWith(corpus, cb)
      VectorOps.pqAdcTopK(corpus, cb, codes,
          corpus.filter(col("vec_id") === 0), k = 11, rerank = 11)
        .collect().map(_.getLong(0)).count(truth.contains)
    }
    val (sh, th) = (hits(sampledCb), hits(trainedCb))
    assert(th >= sh, s"trained ADC recall $th/11 < sampled $sh/11")
    assert(th >= 6, s"trained ADC recall $th/11 unexpectedly low")
  }

  test("brute-force top-k: query vector ranks itself first with cos 1.0") {
    val emb = graft.Tables.embeddings(spark, sf)
    val top = VectorOps.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") === 0), col("embedding"), 5).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("LSH bucket is deterministic and ANN results are a subset of the bucket") {
    val emb = graft.Tables.embeddings(spark, sf)
    val b1 = emb.select(VectorOps.lshBucket(col("embedding"))).collect().toSeq
    val b2 = emb.select(VectorOps.lshBucket(col("embedding"))).collect().toSeq
    assert(b1 == b2)
    val ann = VectorOps.lshTopK(emb, col("vec_id"), col("embedding"),
      emb.filter(col("vec_id") === 0), col("embedding"), 10).collect()
    assert(ann.head.getLong(0) == 0L) // query finds itself
    assert(ann.length > 1)            // and real neighbors from its bucket
  }

  test("IVF-KMeans ANN: self-retrieval, ordering, and recall ≥ single-bucket scan fraction") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
    val ivf = VectorOps.ivfTopK(emb, col("vec_id"), col("embedding"),
      q, col("embedding"), k = 10, nCentroids = 8, nProbe = 2).collect()
    assert(ivf.head.getLong(0) == 0L && ivf.head.getDouble(1) == 1.0)
    val sims = ivf.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
    val exact = VectorOps.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      q, col("embedding"), 10).select("vec_id").as[Long].collect().toSet
    val approx = ivf.map(_.getLong(0)).toSet
    assert((exact intersect approx).nonEmpty)
  }

  test("IVF index is deterministic (fixed seed) and covers the corpus") {
    val emb = graft.Tables.embeddings(spark, sf)
    val (_, b1) = VectorOps.ivfIndex(emb, col("vec_id"), col("embedding"), 8)
    val (_, b2) = VectorOps.ivfIndex(emb, col("vec_id"), col("embedding"), 8)
    assert(b1.count() == emb.count())
    val m1 = b1.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val m2 = b2.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(m1 == m2)
  }

  test("int8 quantization: bounded range, faithful dequantized cosine") {
    val emb = graft.Tables.embeddings(spark, sf)
    val (scale, q) = VectorOps.quantize8(col("embedding"))
    val quantized = emb.select(col("vec_id"), col("embedding"),
      scale.as("s"), q.as("q"))
    // every element within [-127, 127]
    assert(quantized.filter(
      array_max(transform(col("q"), x => abs(x))) > 127).count() == 0)
    // dequantized vector stays ~parallel to the original
    val deq = transform(col("q"), x => x.cast("double") * col("s"))
    val sim = quantized
      .filter(size(col("embedding")) > 0 && col("s") > 0)
      .select(VectorOps.cosine(col("embedding"), deq).as("c"))
    assert(sim.filter(col("c") < 0.99).count() == 0)
  }

  test("ANN recall vs brute force is measurable and nonzero") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 17)
    val exact = VectorOps.bruteForceTopK(emb, col("vec_id"), col("embedding"),
      q, col("embedding"), 20).select("vec_id").as[Long].collect().toSet
    val approx = VectorOps.lshTopK(emb, col("vec_id"), col("embedding"),
      q, col("embedding"), 20).select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.0 && recall <= 1.0)
  }
}
