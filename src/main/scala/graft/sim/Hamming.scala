package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hamming near-dup pair counting over integer fingerprints (image dHash,
  * audio energy hash, video temporal hash, SimHash …) — the shared scale
  * shape behind every `q_*hash_pairs` query:
  *
  *  1. collapse to DISTINCT hash values first, counts riding along as
  *     multiplicities: real corpora concentrate on few distinct
  *     fingerprints (blank images, silence clips), and asset-level
  *     banding would send all their duplicates into one bucket — the
  *     classic hot-key quadratic;
  *  2. banded equi-join over the distinct hashes only: with `b` bands
  *     covering disjoint bit ranges, any pair within Hamming distance
  *     `maxDist < b` shares at least one intact band (pigeonhole), so
  *     recall is EXACT;
  *  3. expand the multiplicities arithmetically — cnt₁·cnt₂ across
  *     distinct hashes, C(cnt,2) within one (distance 0).
  *
  * Candidate-pair cost (the scale question): D distinct hashes spread
  * uniformly over a `w`-bit band collide with probability 2^−w, so the
  * banded join generates ≈ Σ_bands D²/2^(w_band)/2 random candidates plus
  * the true near-pairs. Selectivity is exponential in BAND WIDTH while
  * exact recall only needs `maxDist < nBands` — so always band with the
  * WIDEST bands the distance bound allows: for a 32-bit hash at
  * maxDist 3, 4×8-bit bands generate 16× fewer random candidates than
  * 8×4-bit bands at identical (exact) recall. `bandWidths` supports
  * unequal widths so hash sizes that don't divide evenly (e.g. 14 bits at
  * maxDist 2 → 5+5+4) can still use maximal bands. Null hashes
  * (undecodable payloads) are excluded.
  *
  * The distinct-hash table feeds both sides of the self-join and the
  * within-hash expansion; it is localCheckpointed (eager, reference-
  * tracked — reclaimed when the frame is garbage) rather than persisted,
  * because a persist would pin a CacheManager entry no caller of this
  * one-shot helper could ever drop.
  */
object Hamming {

  /** (hamming, n_pairs) for all unordered pairs at distance ≤ `maxDist`.
    * Band i covers bits [offset_i, offset_i + bandWidths(i)) where offsets
    * are the cumulative widths from bit 0 upward; recall is exact for any
    * `maxDist < bandWidths.length` even if the bands don't cover every
    * hash bit (uncovered differing bits never break a band — they only
    * cost selectivity, so cover the full hash when you can). */
  def pairCounts(hashes: DataFrame, hashCol: String, bandWidths: Seq[Int],
                 maxDist: Int): DataFrame = {
    require(maxDist < bandWidths.length,
      s"pigeonhole recall needs maxDist < nBands ($maxDist >= ${bandWidths.length})")
    val grouped = distinctHashes(hashes, hashCol)
    val cross = bandedCandidates(grouped, bandWidths)
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxDist)
      .select(col("hamming"), (col("cnt1") * col("cnt2")).as("pairs"))
    val within = grouped.filter(col("cnt") >= 2)
      .select(lit(0).as("hamming"), expr("cnt * (cnt - 1) div 2").as("pairs"))
    cross.unionByName(within)
      .groupBy("hamming")
      .agg(sum("pairs").as("n_pairs"))
      .orderBy("hamming")
  }

  /** The distinct-hash table (h, cnt), eagerly materialized — stage 1 of
    * [[pairCounts]], exposed with [[bandedCandidates]] so scale probes can
    * measure the two claims separately: candidates depend on DISTINCT hash
    * cardinality (never corpus size), and on band width exponentially. */
  def distinctHashes(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.filter(col(hashCol).isNotNull)
      .groupBy(col(hashCol).as("h")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)

  /** Distinct candidate pairs (h1 < h2, multiplicities riding along) from
    * the banded equi-join over a (h, cnt) distinct-hash table — THE scale
    * metric of a banding choice: D uniform hashes collide on a w-bit band
    * with probability 2^−w, so expected random candidates ≈
    * Σ_bands D²/2^(w_band)/2 (+ the true near-pairs). */
  def bandedCandidates(grouped: DataFrame, bandWidths: Seq[Int]): DataFrame = {
    require(bandWidths.nonEmpty && bandWidths.forall(w => w > 0 && w <= 62),
      "band widths must be in 1..62")
    // 64 is safe on the signed long: the top band reads sign-extended bits
    // through an arithmetic shiftright, and the mask truncates the
    // extension back to the true bit pattern
    require(bandWidths.sum <= 64, "bands must fit a 64-bit hash")
    val offsets = bandWidths.scanLeft(0)(_ + _).init
    val bandCols = bandWidths.zip(offsets).zipWithIndex.map {
      case ((w, off), i) =>
        struct(lit(i).as("band"),
          expr(s"shiftright(h, $off) & ${(1L << w) - 1}").as("bv"))
    }
    val banded = grouped
      .select(col("h"), col("cnt"), explode(array(bandCols: _*)).as("b"))
      .select(col("h"), col("cnt"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    banded.select(col("band"), col("bv"),
        col("h").as("h1"), col("cnt").as("cnt1"))
      .join(banded.select(col("band"), col("bv"),
        col("h").as("h2"), col("cnt").as("cnt2")),
        Seq("band", "bv"))
      .filter(col("h1") < col("h2"))
      .select("h1", "h2", "cnt1", "cnt2").distinct()
  }

  /** Equal-width convenience overload. */
  def pairCounts(hashes: DataFrame, hashCol: String, nBands: Int,
                 bandBits: Int, maxDist: Int): DataFrame =
    pairCounts(hashes, hashCol, Seq.fill(nBands)(bandBits), maxDist)

  /** Banding CAPACITY PLAN — the candidate law measured without running
    * the join. Per band: bucket count, the largest bucket, and the
    * candidate-pair count the banded self-join would generate from that
    * band (Σ_buckets C(n,2) over DISTINCT hashes — the join's actual
    * fan-out; duplicate multiplicities expand arithmetically afterwards
    * and never enter the join). This is the query to run BEFORE
    * committing to a banding at scale: the sf4 measurement in SCALE.md
    * (SimHash-32 saturating at 78M candidates while SimHash-64 runs the
    * same corpus 57× faster) is exactly this table read ahead of time —
    * when `candidates` approaches D²/(2·buckets) the band is saturated
    * and the fix is a wider band or a wider fingerprint, not a bigger
    * cluster. Cost: one map-side band explode + two partial-aggregated
    * groupBys over DISTINCT hashes; no join, no checkpoint (single
    * consumer), scales with D — never corpus size. */
  def bandingStats(hashes: DataFrame, hashCol: String,
                   bandWidths: Seq[Int]): DataFrame = {
    require(bandWidths.nonEmpty && bandWidths.forall(w => w > 0 && w <= 62),
      "band widths must be in 1..62")
    require(bandWidths.sum <= 64, "bands must fit a 64-bit hash")
    val grouped = hashes.filter(col(hashCol).isNotNull)
      .groupBy(col(hashCol).as("h")).agg(count(lit(1)).as("cnt"))
    val offsets = bandWidths.scanLeft(0)(_ + _).init
    val bandCols = bandWidths.zip(offsets).zipWithIndex.map {
      case ((w, off), i) =>
        struct(lit(i).as("band"),
          expr(s"shiftright(h, $off) & ${(1L << w) - 1}").as("bv"))
    }
    grouped
      .select(explode(array(bandCols: _*)).as("b"))
      .select(col("b.band").as("band"), col("b.bv").as("bv"))
      .groupBy("band", "bv").agg(count(lit(1)).as("n"))
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        sum(expr("n * (n - 1) div 2")).as("candidates"))
      .orderBy("band")
  }
}
