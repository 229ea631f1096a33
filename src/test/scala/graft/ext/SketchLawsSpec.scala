package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Randomized laws for the mergeable sketch family, checked on the raw
  * Aggregator implementations (no Spark session — these are the exact
  * objects partial aggregation folds, so the laws here are the laws
  * the distributed plans rely on). Deterministic seeds: every case is
  * reproducible.
  *  - Bloom: no false negatives ever; merge is commutative,
  *    associative, idempotent (bitwise-OR laws) — any partition
  *    layout, any merge tree, same filter.
  *  - Count-Min: estimate ≥ true count always; merge is cell-wise sum,
  *    so any split of the input stream yields the identical sketch.
  *  - Misra–Gries: every item with frequency > n/k survives; estimates
  *    are lower bounds within n/k.
  */
class SketchLawsSpec extends AnyFunSuite {

  private def randomHashes(rnd: scala.util.Random, max: Int): List[Long] =
    List.fill(rnd.nextInt(max))(rnd.nextLong(1L << 60))

  test("Bloom law: no false negatives under any split/merge tree") {
    val agg = new Bloom.BloomAgg(m = 512, k = 3)
    def build(s: Seq[Long]) = s.foldLeft(agg.zero)(agg.reduce)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val keys = randomHashes(rnd, 80)
      val (a, b) = keys.splitAt(if (keys.isEmpty) 0 else rnd.nextInt(keys.size + 1))
      val merged = agg.merge(build(a), build(b))
      keys.foreach { h =>
        val ok = Bloom.positions(h, 512, 3)
          .forall(p => (merged(p >>> 6) >>> (p & 63) & 1L) == 1L)
        assert(ok, s"false negative for $h")
      }
    }
  }

  test("Bloom law: merge is commutative, associative, idempotent") {
    val agg = new Bloom.BloomAgg(m = 256, k = 3)
    def f(s: Seq[Long]) = s.foldLeft(agg.zero)(agg.reduce)
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 200) {
      val (xs, ys, zs) =
        (randomHashes(rnd, 40), randomHashes(rnd, 40), randomHashes(rnd, 40))
      // fresh arrays each call: merge mutates its left argument
      assert(agg.merge(f(xs), f(ys)).toSeq == agg.merge(f(ys), f(xs)).toSeq)
      assert(agg.merge(agg.merge(f(xs), f(ys)), f(zs)).toSeq ==
        agg.merge(f(xs), agg.merge(f(ys), f(zs))).toSeq)
      assert(agg.merge(f(xs), f(xs)).toSeq == f(xs).toSeq)
    }
  }

  test("CMS law: estimate >= true count; any stream split merges identically") {
    val w = 64
    val d = 4
    val agg = new CountMin.CmsAgg(w, d)
    val rnd = new scala.util.Random(44)
    for (_ <- 1 to 200) {
      // small key space so collisions and repeats actually occur
      val keys = List.fill(rnd.nextInt(300))(rnd.nextLong(50L))
      val (a, b) = keys.splitAt(if (keys.isEmpty) 0 else rnd.nextInt(keys.size + 1))
      val whole = keys.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(whole.toSeq == merged.toSeq, "cell-wise-sum merge law")
      keys.groupBy(identity).foreach { case (h, occ) =>
        val est = Bloom.positions(h, w, d).zipWithIndex
          .map { case (p, i) => merged(i * w + p) }.min
        assert(est >= occ.size, s"undercount for $h")
      }
    }
  }

  test("MG law: heavy items survive any split; estimates lower-bounded within n/k") {
    val k = 5
    val mg = new HeavyHitters.MisraGries(k)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rnd = new scala.util.Random(45)
    for (_ <- 1 to 200) {
      // zipf-ish skew so some items actually cross the n/k bar
      val xs = List.fill(rnd.nextInt(400))(
        alphabet(math.min(rnd.nextInt(rnd.nextInt(8) + 1), 7)))
      val (a, b) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1))
      val sketch = mg.merge(
        a.foldLeft(mg.zero)(mg.reduce), b.foldLeft(mg.zero)(mg.reduce))
      val n = xs.size
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (item, c) =>
        if (c > n.toLong / k)
          assert(sketch.contains(item), s"heavy item $item (freq $c of $n) lost")
        sketch.get(item).foreach { est =>
          assert(est <= c && est >= c - n.toLong / k,
            s"estimate $est outside [${c - n.toLong / k}, $c] for $item")
        }
      }
    }
  }
}
