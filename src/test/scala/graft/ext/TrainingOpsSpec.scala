package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-5 training-pipeline operators: sequence packing, repetition
  * quality signals, benchmark-contamination detection. */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Packing --------------------------------------------------------

  private lazy val packDocs = (0L until 200L)
    .map(i => (i, ("tok " * ((i % 37).toInt + 1)).trim)).toDF("doc_id", "text")

  test("packOffsets: per-shard offsets are contiguous and non-overlapping") {
    val out = Packing.packOffsets(packDocs, col("doc_id"),
      size(TextOps.tokens(col("text"))), nShards = 4, seqLen = 64)
    val rows = out.collect().map(r => (r.getLong(2), r.getLong(0),
      r.getLong(1), r.getLong(3), r.getLong(4))) // shard, doc, n, off, pack
    assert(rows.length == 200, "every doc packed exactly once")
    rows.groupBy(_._1).foreach { case (_, inShard) =>
      // sorted by offset, each doc starts exactly where the previous ended
      val sorted = inShard.sortBy(_._4)
      assert(sorted.head._4 == 0L, "first doc of a shard starts at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, _, n, off, _), (_, _, _, off2, _)) =>
          assert(off2 == off + n, "offsets contiguous within shard")
        case _ =>
      }
      // pack_seq is the fixed-length sequence index of the start offset
      sorted.foreach { case (_, _, _, off, pack) =>
        assert(pack == off / 64, "pack_seq = offset div seqLen")
      }
    }
  }

  test("packOffsets is deterministic and growth-stable per shard stream") {
    val a = Packing.packOffsets(packDocs, col("doc_id"),
      size(TextOps.tokens(col("text"))), nShards = 4, seqLen = 64).collect().toSet
    val b = Packing.packOffsets(packDocs, col("doc_id"),
      size(TextOps.tokens(col("text"))), nShards = 4, seqLen = 64).collect().toSet
    assert(a == b)
  }

  // ---- Repetition -----------------------------------------------------

  test("chunkTokens: exact windows, overlap, short-doc and boundary cases") {
    // 10 tokens t0..t9, chunkLen 4, stride 3 → chunks start at 0,3,6
    // (1 + ceil((10-4)/3) = 3): [t0..t3] [t3..t6] [t6..t9] — the last
    // exactly consumes the tail; plus a short doc (< chunkLen) and one
    // hitting a partial final window.
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"),                                   // short: 1 chunk
      (3L, (0 until 12).map(i => s"u$i").mkString(" "))) // starts 0,3,6,9; last has 3
      .toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, col("doc_id"),
      TextOps.tokens(col("text")), chunkLen = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out.keys.count(_._1 == 1L) === 3)
    assert(out((1L, 0L)) === ((0L, 4L, "t0 t1 t2 t3")))
    assert(out((1L, 1L)) === ((3L, 4L, "t3 t4 t5 t6"))) // 1-token overlap
    assert(out((1L, 2L)) === ((6L, 4L, "t6 t7 t8 t9")))
    assert(out.keys.count(_._1 == 2L) === 1)
    assert(out((2L, 0L)) === ((0L, 2L, "a b")))
    assert(out.keys.count(_._1 == 3L) === 4)
    assert(out((3L, 3L)) === ((9L, 3L, "u9 u10 u11"))) // partial tail
  }

  test("repetition stats: known answers, case folding, single-token doc") {
    val docs = Seq(
      (1L, "a a a b"),         // 4 toks, 2 distinct, top 3; bigrams: aa aa ab
      (2L, "A a"),             // case-folds to a a
      (3L, "solo"),            // no bigrams
      (4L, "w x y z")          // fully distinct
    ).toDF("doc_id", "text")
    val out = Repetition.stats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = out(1L)
    assert(d1.getLong(1) == 4L && d1.getLong(2) == 2L)
    assert(d1.getDouble(3) == 0.5)
    assert(d1.getLong(4) == 3L && d1.getDouble(5) == 0.75)
    assert(d1.getLong(6) == 3L && d1.getDouble(7) == 0.3333)

    val d2 = out(2L)
    assert(d2.getLong(4) == 2L, "tokens are case-folded before counting")

    val d3 = out(3L)
    assert(d3.getLong(6) == 0L && d3.getDouble(7) == 0.0,
      "single-token doc has zero bigrams and zero dup fraction")

    val d4 = out(4L)
    assert(d4.getDouble(3) == 1.0 && d4.getDouble(7) == 0.0)
  }

  // ---- Contamination --------------------------------------------------

  test("contamination matches an independently computed shingle overlap") {
    // word-bag docs: a shared pool with deliberate trigram collisions
    // plus per-doc-unique vocab docs that can never be contaminated
    val docs = (0L until 60L).map { i =>
      val words =
        if (i % 2 == 0) (0 until 8).map(k => s"w${(i + k) % 23}")
        else (0 until 8).map(k => s"u${i}x$k")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")

    val out = Contamination.check(docs, col("doc_id"), col("text"),
      nShards = 5, evalKeep = 1, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent expectation: plain Scala shingling + set intersection
    val shard = docs.select(col("doc_id"),
      Sampling.shard(col("doc_id"), 5).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def shingles(text: String): Set[String] =
      text.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalSh = texts.collect { case (id, t) if shard(id) < 1 => shingles(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = texts.collect { case (id, t) if shard(id) >= 1 =>
      val sh = shingles(t)
      id -> ((sh.size.toLong, sh.count(evalSh.contains).toLong))
    }.toMap

    assert(out.keySet == expected.keySet, "output covers exactly the train docs")
    expected.foreach { case (id, (nSh, nC)) =>
      assert(out(id)._1 == nSh, s"doc $id distinct shingles")
      assert(out(id)._2 == nC, s"doc $id contaminated shingles")
    }
    // sanity: the fixture actually exercises both outcomes
    assert(expected.values.exists(_._2 > 0), "some contamination present")
    assert(expected.values.exists(_._2 == 0), "some clean docs present")
  }

  // ---- SubstringScrub -------------------------------------------------

  // Distinct vocabularies per doc except the planted repeats, so every
  // expectation is hand-derivable. w = 8 throughout.
  private lazy val scrubDocs = {
    val passage = (1 to 10).map(i => s"p$i").mkString(" ") // 10 shared tokens
    val block = (1 to 8).map(i => s"w$i").mkString(" ")    // 8-token block
    Seq(
      (1L, s"$passage tailA1 tailA2"),          // first occurrence — kept
      (2L, s"headB1 headB2 $passage tailB1"),   // later occurrence — excised
      (3L, s"$block x $block"),                 // within-doc repeat
      (4L, "solo tiny doc"))                    // < w tokens — untouched
      .toDF("doc_id", "text")
  }

  private def scrubMap(df: org.apache.spark.sql.DataFrame) =
    SubstringScrub.scrub(df, col("doc_id"), col("text"), w = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("substringScrub: exact rewrites — keep first occurrence, excise later ones") {
    val out = scrubMap(scrubDocs)
    // doc 1 holds the first (min doc_id) occurrence of every shared
    // window — fully kept.
    assert(out(1L) == ((12L, 0L, ((1 to 10).map(i => s"p$i") ++
      Seq("taila1", "taila2")).mkString(" "))))
    // doc 2's three windows fully inside the passage (starts 3,4,5,
    // covering tokens 3..12) are dups of doc 1's starts 1,2,3 —
    // islands merge to [3,12], excising the whole passage.
    assert(out(2L) == ((13L, 10L, "headb1 headb2 tailb1")))
    // doc 3: only the window at start 10 repeats the start-1 block
    // (starts 2..9 all cross the 'x') — excise [10,17].
    assert(out(3L) == ((17L, 8L, ((1 to 8).map(i => s"w$i") :+ "x")
      .mkString(" "))))
    // doc 4: shorter than w — no windows, untouched.
    assert(out(4L) == ((3L, 0L, "solo tiny doc")))
  }

  test("substringScrub: idempotent — scrubbing the scrubbed corpus changes nothing") {
    val once = SubstringScrub.scrub(scrubDocs, col("doc_id"), col("text"), w = 8)
    val again = scrubMap(once.select(col("doc_id"),
      col("scrubbed_text").as("text")))
    once.collect().foreach { r =>
      val (id, nt, nr, txt) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(again(id) == (((nt - nr), 0L, txt)), s"doc $id not idempotent")
    }
  }


  test("domain_reweight: weights shift toward high-excess-loss domains") {
    val rows = graft.SparkEntry.queries("domain_reweight")(spark, sf)
      .select("source", "excess_x1e6", "weight_x1e6")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val d = rows.length
    assert(d > 1, "needs several domains")
    val uniform = 1000000L / d
    // The MWU update is monotone in excess: sorting by excess and by
    // final weight must agree (ties in excess may tie in weight).
    val byExcess = rows.sortBy(r => (r._2, r._1)).map(_._3)
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b },
      s"weights not monotone in excess: ${rows.sortBy(_._2).mkString(", ")}")
    // And the shift engages: the max-excess domain ends above uniform,
    // the min-excess domain below (excesses differ in this corpus).
    val maxE = rows.maxBy(_._2)
    val minE = rows.minBy(_._2)
    assert(maxE._2 > minE._2, "corpus must spread excess loss")
    assert(maxE._3 > uniform, s"max-excess ${maxE} should exceed uniform $uniform")
    assert(minE._3 < uniform, s"min-excess ${minE} should sit below uniform $uniform")
  }
}
