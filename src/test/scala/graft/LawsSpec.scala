package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style laws for the pure kernels (SURVEY.md §5.2.4) — seeded
  * random generation, no Spark session, runs in milliseconds. Covers the
  * algebra the distributed operators rely on. */
class LawsSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)
  private val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")

  private def genSet(): Set[String] =
    (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.size))).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("jaccard is symmetric, bounded, and 1 iff equal (non-empty)") {
    (1 to 500).foreach { _ =>
      val (a, b) = (genSet(), genSet())
      val j = jaccard(a, b)
      assert(j == jaccard(b, a))
      assert(j >= 0.0 && j <= 1.0)
      if (a.nonEmpty || b.nonEmpty) assert((j == 1.0) == (a == b))
    }
  }

  test("prefix-filter lemma: J >= t pairs share an element in both prefixes") {
    val t = 0.8 // Dedup.JaccardThreshold
    def prefix(x: Set[String]): Set[String] = {
      val n = x.size
      val plen = n - math.ceil(t * n).toInt + 1
      x.toSeq.sorted.take(plen).toSet // any fixed total order satisfies the lemma
    }
    var hits = 0
    (1 to 5000).foreach { _ =>
      val a = genSet()
      // perturb a little so high-jaccard pairs actually occur
      val b = if (rnd.nextBoolean() || a.isEmpty) genSet()
              else a - a.toSeq(rnd.nextInt(a.size))
      if (a.nonEmpty && b.nonEmpty && jaccard(a, b) >= t) {
        hits += 1
        assert(prefix(a).intersect(prefix(b)).nonEmpty,
          s"prefix filter would miss a=$a b=$b j=${jaccard(a, b)}")
      }
    }
    assert(hits > 50, s"generator produced too few >=t pairs ($hits) to trust this test")
  }

  test("stub decoder is deterministic and content-sensitive") {
    import graft.multimodal.Multimodal._
    val md = StubDecoder.newDigest()
    (1 to 200).foreach { _ =>
      val bs = Array.fill(rnd.nextInt(64) + 1)(rnd.nextInt().toByte)
      val r = MediaRecord(1L, bs, "png", 100, 100)
      assert(StubDecoder.decode(md, r) == StubDecoder.decode(md, r))
      val flipped = bs.clone(); flipped(0) = (flipped(0) ^ 0x1).toByte
      assert(StubDecoder.decode(md, r).checksum !=
             StubDecoder.decode(md, MediaRecord(1L, flipped, "png", 100, 100)).checksum)
    }
  }


  test("exact decimal money sums are order-independent (the Dsl guarantee)") {
    val cents = Seq.fill(1000)(BigDecimal(rnd.nextInt(2000000)) / 100)
    val shuffled = rnd.shuffle(cents)
    assert(cents.sum == shuffled.sum) // decimal addition is associative/commutative
    // the double counterexample this guards against:
    val doubles = cents.map(_.toDouble)
    val shuffledD = rnd.shuffle(doubles)
    // (double sums MAY differ under reordering; decimal sums may not)
    assert(cents.sum.toDouble == shuffled.sum.toDouble)
    assert(doubles.nonEmpty && shuffledD.nonEmpty)
  }
}
