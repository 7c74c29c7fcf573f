package graft.sim

import graft.SparkSpec

/** Property test for the banded pair-count operator itself (the four
  * q_*hash_pairs queries prove it against DuckDB on real fingerprints;
  * this proves EXACT pigeonhole recall on adversarial random data, for
  * equal AND unequal band widths, including the 64-bit top-band case the
  * signed long makes subtle). Ground truth is an all-pairs scan over the
  * same distinct-collapse semantics. */
class HammingSpec extends SparkSpec {

  private def brute(all: Seq[Long], maxDist: Int): Map[Int, Long] = {
    val counts = all.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val ks = counts.keys.toVector
    val cross = for {
      i <- ks.indices; j <- (i + 1) until ks.size
      d = java.lang.Long.bitCount(ks(i) ^ ks(j)) if d <= maxDist
    } yield (d, counts(ks(i)) * counts(ks(j)))
    val within = counts.valuesIterator.filter(_ >= 2).map(c => (0, c * (c - 1) / 2))
    (cross ++ within).groupBy(_._1)
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
  }

  test("pairCounts == all-pairs ground truth for equal and unequal bands, 32 and 64 bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)

    // 32-bit population: random base + planted near-pairs at dist 1-3 +
    // exact duplicates (multiplicity expansion)
    val base32 = Seq.fill(200)(rnd.nextLong() & 0xFFFFFFFFL)
    val near32 = base32.take(40).map { h =>
      val flips = rnd.shuffle((0 until 32).toList).take(1 + rnd.nextInt(3))
      flips.foldLeft(h)((x, b) => x ^ (1L << b))
    }
    val all32 = base32 ++ near32 ++ base32.take(15)
    // 64-bit population: full signed range (bit 63 exercised) + near + dups
    val base64 = Seq.fill(200)(rnd.nextLong())
    val near64 = base64.take(40).map { h =>
      val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(4))
      flips.foldLeft(h)((x, b) => x ^ (1L << b))
    }
    val all64 = base64 ++ near64 ++ base64.take(15)

    val cases = Seq(
      (all32, Seq(8, 8, 8, 8), 3),          // shipped SimHash-32 banding
      (all32, Seq(4, 4, 4, 4, 4, 4, 4, 4), 3), // former equal banding
      (all32, Seq(13, 13, 6), 2),           // unequal, partial-entropy tail
      (all32, Seq(5, 5, 4), 2),             // 14-bit-style unequal (low bits)
      (all64, Seq(13, 13, 13, 13, 12), 4),  // shipped SimHash-64 banding
      (all64, Seq(16, 16, 16, 16), 3))      // top band covers the sign bit
    cases.foreach { case (all, widths, maxDist) =>
      val got = Hamming.pairCounts(all.toDF("h"), "h", widths, maxDist)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(got == brute(all, maxDist),
        s"widths=$widths maxDist=$maxDist got=$got expected=${brute(all, maxDist)}")
    }
  }
}
