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
  *  2. banded equi-join over the distinct hashes only: with `nBands`
  *     bands of `bandBits` bits, any pair within Hamming distance
  *     `maxDist < nBands` shares at least one intact band (pigeonhole),
  *     so recall is EXACT;
  *  3. expand the multiplicities arithmetically — cnt₁·cnt₂ across
  *     distinct hashes, C(cnt,2) within one (distance 0).
  *
  * Join cost scales with distinct-hash cardinality (≤ 2^bits), never
  * corpus size. Null hashes (undecodable payloads) are excluded.
  */
object Hamming {

  /** (hamming, n_pairs) for all unordered pairs at distance ≤ `maxDist`. */
  def pairCounts(hashes: DataFrame, hashCol: String, nBands: Int,
                 bandBits: Int, maxDist: Int): DataFrame = {
    require(nBands > 0 && bandBits > 0, "bands and bits must be positive")
    require(maxDist < nBands,
      s"pigeonhole recall needs maxDist < nBands ($maxDist >= $nBands)")
    val mask = (1L << bandBits) - 1
    val grouped = hashes.filter(col(hashCol).isNotNull)
      .groupBy(col(hashCol).as("h")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = grouped.select(col("h"), col("cnt"),
      explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bv",
        expr(s"shiftright(h, cast($bandBits * band as int)) & $mask"))
    val cross = banded.select(col("band"), col("bv"),
        col("h").as("h1"), col("cnt").as("cnt1"))
      .join(banded.select(col("band"), col("bv"),
        col("h").as("h2"), col("cnt").as("cnt2")),
        Seq("band", "bv"))
      .filter(col("h1") < col("h2"))
      .select("h1", "h2", "cnt1", "cnt2").distinct()
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
}
