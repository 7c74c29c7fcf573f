package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Pipeline, Tables}
import graft.operators.{Scalers, Windows}

/** End-to-end behavioral detection QUALITY, as an oracle-checkable row
  * (round-10 verdict item 5; SURVEY §5.4's behavioral test promoted to
  * the registry).
  *
  * The fixture: the per-minute click series from `events`, min-max scaled
  * with the scaler FIT ON THE CLEAN SERIES (the reference's frozen-scaler
  * posture, `preprocess_data.py` fit-then-transform), then deterministic
  * spikes of +[[SpikeMagnitude]] (in scaled units) injected at every
  * [[SpikePeriod]]th row of the ordered series. Stride-1 length-[[graft.Pipeline.SeqLen]]
  * windows are scored by a FROZEN TRAINED LSTM autoencoder (the artifact
  * `resources/graft/detect_model.json`, produced once by
  * `tools/TrainDetectModel` — real BPTT training on the clean series, not
  * glorot noise), and windows with reconstruction MSE above [[Threshold]]
  * are flagged.
  *
  * The emitted one-row report (n_windows, n_flagged, spike_recall,
  * clean_precision) is what the DuckDB oracle checks: the oracle replays
  * the series/window/ground-truth arithmetic and asserts PERFECT detection
  * (n_flagged = planted windows, recall = precision = 1.0) — so a model
  * regression (missed spike → recall < 1, clean false positive →
  * precision < 1, either changes n_flagged) fails the row's hash compare.
  * Measured margins (TrainDetectModel prints them — see [[Threshold]]):
  * every clean window at least 1.6× under the threshold, every spiked
  * window at least 1.6× over; a glorot-initialized UNTRAINED model scores
  * clean windows ABOVE the threshold (precision collapse,
  * DetectQualitySpec) — the row certifies training quality, not just
  * plumbing.
  *
  * Scale shape: one minute-keyed aggregate, a 2-value broadcast scaler,
  * the boundary-replicated bucketed window plan (no single-task stage —
  * q_window_w2_partitioned's oracle-proven machinery), map-only scoring
  * with broadcast weights, and a single final aggregate row.
  */
object DetectQuality {

  /** Spikes land on every 97th ROW of the ordered series (97 prime → no
    * resonance with the window length; rank-based rather than
    * timestamp-modulus so the planted count scales with the series at
    * EVERY scale factor — sf0.001's 210 minutes happen to contain zero
    * ts_min multiples of 97). */
  val SpikePeriod = 97

  /** Spike height in scaled units: +2.0 on a series whose clean values
    * lie in [0, 1] — a spiked step contributes ≥ 2²/L ≈ 0.2 to its
    * window's MSE before any model error. */
  val SpikeMagnitude = 2.0

  /** Flagging threshold on window MSE, centered between the frozen
    * model's measured decision margins (TrainDetectModel printout,
    * sf0.01 + sf0.1): trained clean MSE mean 0.017–0.021 / MAX 0.081,
    * weakest spiked window 0.205, untrained-glorot clean mean 0.17 —
    * so 0.13 sits 1.6× over the worst clean window, 1.6× under the
    * weakest spike, ~7× over the trained clean mean, and BELOW what an
    * untrained model scores on clean data (the row fails without real
    * training). */
  val Threshold = 0.13

  /** The clean detection series: per-minute mean click value, min-max
    * scaled on its own (clean) fit — shared VERBATIM by the training tool
    * and the quality query so the model can never be fit on a different
    * series than it is judged on. */
  def cleanSeries(spark: SparkSession, dir: String): DataFrame = {
    val minutes = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .groupBy(expr("ts_us div 60000000").as("ts_min"))
      .agg(avg("value").as("v"))
    Scalers.fitMinMax(minutes, Seq("v")).transform(minutes)
  }

  /** Clean series + deterministic spike injection (post-transform: the
    * scaler is frozen on the clean fit, so adding in scaled space is
    * identical to adding `SpikeMagnitude · (max−min)` raw units). The
    * row rank comes from the scale-safe prefix-sum numbering — no
    * single-partition stage. */
  def spikedSeries(clean: DataFrame): DataFrame =
    Windows.globalRowNumber(clean, Seq("ts_min"), "_rn")
      .withColumn("is_spike",
        when(pmod(col("_rn"), lit(SpikePeriod)) === 0, 1.0).otherwise(0.0))
      .withColumn("v", col("v") + col("is_spike") * lit(SpikeMagnitude))
      .drop("_rn")

  /** The frozen trained artifact, loaded once per JVM from the classpath
    * (ships inside the library jar — no filesystem path coupling). */
  lazy val frozenModel: Lstm.AeParams = {
    val in = getClass.getResourceAsStream("/graft/detect_model.json")
    require(in != null, "graft/detect_model.json missing from classpath " +
      "(regenerate with: runMain graft.tools.TrainDetectModel)")
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    Lstm.fromJson(txt)
  }

  /** Deterministic JIT warmup of the frozen model's scoring path
    * (round-16 order #5): q_detect_quality's cert band was 2.36–7.95 s
    * across cold-fork contexts for a ~1.7 s steady — the spread is C2
    * compile churn of the LSTM forward/mse kernels landing inside the
    * timed reps of a fresh child JVM. Running the same methods on a
    * synthetic window until they are compiled (well past the tier-4
    * invocation threshold) moves that churn BEFORE rep 1; the bench
    * records the warmup's wall time separately so it is visible, never
    * priced into a steady number. Local mode = one JVM, so driver-side
    * warmup compiles the very methods the executor threads run. */
  def jitWarmup(iters: Int = 20000): Double = {
    val x = breeze.linalg.DenseMatrix.tabulate(Pipeline.SeqLen, 1) {
      (i, _) => (i % 7) / 7.0
    }
    // warm the path scoring actually runs (Pipeline.scoreWindows uses the
    // allocation-bounded ReusableScorer since round 19; bit-identical
    // values, so the returned sink is unchanged)
    val scorer = new Lstm.ReusableScorer(frozenModel)
    var sink = 0.0
    var k = 0
    while (k < iters) {
      sink += scorer.mse(x)
      k += 1
    }
    // returned (and checked) so the loop is observable and cannot be
    // dead-code-eliminated by the JIT it exists to warm
    sink
  }

  /** Per-window ground truth from the window id ALONE: window w covers
    * series rows [w, w+L−1] and spikes sit on every [[SpikePeriod]]th
    * row, so w's window is spiked iff the next multiple of the period at
    * or after w lands within L rows. Pure arithmetic — no second pass
    * over the window structs, no label column near the model, no join
    * (DetectQualitySpec pins it equal to the exists-over-members read). */
  private[model] def truthFromId(windowId: Column): Column =
    pmod(lit(SpikePeriod) - pmod(windowId, lit(SpikePeriod)),
      lit(SpikePeriod)) < lit(Pipeline.SeqLen)

  /** The registry row body: windows → frozen-model scores → flags vs
    * planted ground truth → one report row. */
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    val sp = spikedSeries(cleanSeries(spark, dir))
    val wins = Windows.slidingWindowsPartitioned(sp, Seq("ts_min"),
      Seq("v"), Pipeline.SeqLen)
    // EXPLICIT partition count before scoring: the window rows are a few
    // MB, so AQE coalesces their shuffle to ONE partition — right for
    // shuffle-read cost, wrong here because LSTM inference is ~ms per ROW
    // (measured: 20.4 s single-core vs ~1 s spread at sf0.1). An explicit
    // repartition(n) is exempt from AQE coalescing by contract.
    val scored = Pipeline.scoreWindows(spark,
      wins.select("window_id", "window")
        .repartition(spark.sparkContext.defaultParallelism),
      Seq("v"), frozenModel)
    val flags = scored
      .select(when(col("mse") > lit(Threshold), 1L).otherwise(0L).as("f"),
        truthFromId(col("window_id")).cast("long").as("t"))
    // try_divide: a degenerate run (nothing planted / nothing flagged)
    // must surface as a NULL ratio — an oracle MISMATCH — not an ANSI
    // division error that kills the whole Verify dump
    flags.agg(
      count(lit(1)).as("n_windows"),
      sum("f").as("n_flagged"),
      round(try_divide(sum(col("f") * col("t")).cast("double"), sum("t")), 6)
        .as("spike_recall"),
      round(try_divide(sum(col("f") * col("t")).cast("double"), sum("f")), 6)
        .as("clean_precision"))
  }
}
