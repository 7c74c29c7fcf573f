package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset-curation sampling — the reproducible alternative
  * to RNG sampling for training-data pipelines: the keep/drop decision is a
  * pure function of the row id, so it is stable across runs, partitionings,
  * retries and engines (md5 basis → DuckDB-oracle-checkable), and a row's
  * fate never changes when the corpus around it grows.
  *
  * Scale shape: every operator here is a scan-side filter (predicate on a
  * hash of the id) — zero shuffle, combines with any downstream plan; the
  * split-leakage audit is a distinct + left-semi join on the fingerprint,
  * never a cartesian.
  */
object Sampling {

  /** Deterministic id-hash bucket in [0, buckets): first 12 md5 hex chars
    * of the id rendered as a string, mod buckets. Cross-engine stable. */
  def hashBucket(id: Column, buckets: Int = 1000): Column =
    pmod(conv(substring(md5(id.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** Uniform deterministic sample: keep rows whose id-hash bucket falls
    * below rate·buckets. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
                   buckets: Int = 1000): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < lit(math.round(rate * buckets)))

  /** Stratified deterministic sample: per-stratum keep-rates (e.g.
    * downsample a dominant language); strata absent from `rates` use
    * `defaultRate`. Same id ⇒ same decision under any stratum layout. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       buckets: Int = 1000): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultRate * buckets)): Column) {
        case (acc, (k, v)) =>
          when(col(stratumCol) === k, lit(math.round(v * buckets))).otherwise(acc)
      }
    df.filter(hashBucket(col(idCol), buckets) < rateCol)
  }

  /** Temperature-weighted mixture sampling at α = 0.5 — the multilingual
    * data-mixing recipe (keep language l with rate ∝ n_l^(α−1), flattening
    * the mix toward rare languages; α = 0.5 ⇒ rate_l = min(1, c/√n_l)).
    *
    * α is FIXED at 0.5 deliberately: `sqrt` and division are
    * correctly-rounded IEEE operations, so the per-stratum threshold
    * `floor(c·buckets/√n_l)` is bit-identical cross-engine — a generic
    * `pow(n, α−1)` is libm-dependent and could flip a floor boundary. The
    * per-stratum form also avoids normalizing by Σ_l n_l^α, whose
    * engine-dependent summation order would reintroduce ulp drift.
    *
    * Scale shape: one tiny stratum-count aggregate broadcast back onto the
    * scan; the keep decision stays a scan-side filter — the data itself
    * never shuffles. */
  def sampleTemperatureHalf(df: DataFrame, idCol: String, stratumCol: String,
                            c: Double, buckets: Int = 1000): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
    df.join(broadcast(counts), Seq(stratumCol))
      .filter(hashBucket(col(idCol), buckets) <
        least(lit(buckets.toLong), floor(lit(c * buckets) / sqrt(col("_n")))))
      .drop("_n")
  }

  /** Source mixing weights — the corpus-mixture table every multi-source
    * training run starts from: per source, document and token counts, the
    * raw token share, and a √-tempered sampling weight relative to the
    * dominant source (the α=0.5 temperature of multilingual/multi-corpus
    * sampling: up-weights small sources without letting the largest one
    * drown the mixture). Normalizing by the max (one exact BIGINT) rather
    * than by Σ√tokens keeps the result deterministic — sqrt and division
    * are correctly-rounded IEEE ops, but a sum of k doubles would depend
    * on accumulation order.
    *
    * Scale shape: per-doc token counts are scan-side (`size` of the token
    * array — no explode), one map-side-combinable aggregate to source
    * grain, and a 1-row broadcast of the totals; sources are few by
    * construction. */
  def mixWeights(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val per = df.groupBy(srcCol).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextStats.tokens(lower(col(textCol)))).cast("long"))
        .as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("_tt"), max("n_tokens").as("_mt"))
    per.crossJoin(broadcast(tot))
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("_tt").cast("double"))
          .as("share"),
        (sqrt(col("n_tokens").cast("double")) /
          sqrt(col("_mt").cast("double"))).as("w_sqrt"))
  }

  /** Split-leakage audit: values of `keyCol` present in BOTH frames (e.g.
    * text fingerprints shared by a train and an eval split — the
    * contamination check every training pipeline needs). Distinct +
    * left-semi join: only distinct keys shuffle, never row payloads. */
  def overlap(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.select(keyCol).distinct()
      .join(b.select(keyCol).distinct(), Seq(keyCol), "left_semi")

  /** Deterministic training-shard assignment + within-shard order: the
    * reproducible alternative to `orderBy(rand())` for writing a training
    * corpus as N shuffled shards. `shard` = id-hash bucket in [0, shards)
    * (same md5 basis as [[hashBucket]]), `pos` = 1-based rank inside the
    * shard by (md5 hex, id) — so the global read order
    * (shard, pos) is a pure function of the ids: stable across runs,
    * partitionings, retries and engines, and a row's slot never moves when
    * unrelated rows are added to other shards.
    *
    * Scale shape: one hash exchange on `shard` + a keyed rank window —
    * no global sort, no single-partition stage. `shards` is the write
    * parallelism knob: set it ≫ executor count at scale (the rank window
    * sorts each shard locally, ~corpus/shards rows per task). */
  def shardAssign(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val clash = Seq("_hx", "shard", "pos").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has internal/output column(s) ${clash.mkString(", ")}")
    df.withColumn("_hx", md5(col(idCol).cast("string").cast("binary")))
      .withColumn("shard",
        pmod(conv(substring(col("_hx"), 1, 12), 16, 10).cast("long"),
          lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_hx"), col(idCol)))
        .cast("long"))
      .drop("_hx")
  }
}
