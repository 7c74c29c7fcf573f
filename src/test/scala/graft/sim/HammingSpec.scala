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

  test("bandingStats == hand-computed capacity plan; candidates sum matches join fan-out") {
    import spark.implicits._
    // 6 distinct hashes over 2×4-bit bands; h=1 appears 3× (multiplicity
    // must NOT inflate the plan — capacity is over distinct hashes)
    val hashes = Seq(0x01L, 0x01L, 0x01L, 0x11L, 0x21L, 0x02L, 0x12L, 0x30L)
    val stats = Hamming.bandingStats(hashes.toDF("h"), "h", Seq(4, 4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // band 0 (low nibble): buckets {1:3 distinct, 2:2, 0:1} → C(3,2)+C(2,2)=3+1=4
    // band 1 (high nibble): {0:2, 1:2, 2:1, 3:1} → 1+1=2
    assert(stats.toSeq == Seq((0, 3L, 3L, 4L), (1, 4L, 2L, 2L)))
    // the plan's candidate total equals the real banded join's distinct
    // fan-out (bandedCandidates dedups pairs across bands, so it can only
    // be <= the per-band sum; equality holds when no pair shares 2 bands)
    val joinPairs = Hamming.bandedCandidates(
      Hamming.distinctHashes(hashes.toDF("h"), "h"), Seq(4, 4)).count()
    assert(joinPairs <= stats.map(_._4).sum)
    // band0: (01,11)(01,21)(11,21)(02,12); band1: (01,02)(11,12) — no
    // pair collides in both bands, so the union is the full per-band sum
    assert(joinPairs == 6)
  }
}
