package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType}

/** PromQL range-function family, batch form.
  *
  * The reference delegates these to the Prometheus server — its collection
  * queries embed them directly (`rate(windows_cpu_time_total{...}[1m])`,
  * reference config.yaml:9-17, fetched via `/api/v1/query_range`,
  * data_collector.py:41). An engine that replaces that server side must
  * evaluate them itself over raw samples. Implemented here over any keyed
  * sample table as single-shuffle keyed windows / aggregates:
  *
  *  - [[overTime]]      — `avg/min/max/sum/count/stddev_over_time` (trailing
  *                        RANGE frame per key)
  *  - [[derivPredict]]  — `deriv()` + `predict_linear()` (per-key least
  *                        squares over the sample range)
  *  - [[resetsChanges]] — `resets()` + `changes()` (counter drop / value
  *                        change counts)
  *  - [[deltaIrate]]    — `delta()` / `idelta()` / `irate()` (first/last and
  *                        last-two sample forms)
  *  - [[ewma]]          — exponentially-weighted moving average (the
  *                        smoothing half of `holt_winters()`), bounded-lag
  *                        closed form
  *
  * Numeric determinism contract (what makes these oracle-checkable to the
  * last bit): every aggregate is computed from EXACT integer sums — values
  * enter as milli-units (`round(value*1000)::long`), timestamps as integer
  * seconds relative to the per-key minimum — and only the final, fixed
  * expression over those sums runs in doubles, identically ordered on both
  * engines. No engine-level fp accumulation order can leak into the result.
  *
  * Scale: each function is ONE hash-partitioned window and/or ONE keyed
  * aggregate — a single shuffle on the series key, no single-partition
  * stage, no self-join. At 100 TB the work is embarrassingly parallel in
  * the series key (Prometheus cardinality: millions of series, each small).
  * Long sums hold to ~9e18: milli-values × month-long second-offsets keep
  * Σxy ≤ ~1e16 per series even at 10^7 samples; beyond that, escalate the
  * sum columns to decimal(38,0) — the expression shape is unchanged.
  */
object Rates {

  private def requireAbsent(df: DataFrame, cols: Seq[String]): Unit = {
    val clash = cols.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has internal/output column(s) ${clash.mkString(", ")}")
  }

  /** Trailing-range `*_over_time` family: for every sample, the
    * count/sum/avg/stddev(pop)/min/max of `milliCol` (integer milli-units)
    * over `[ts - rangeUs, ts]` within its key. Emits `cnt_ot` (long),
    * `sum_ot` (long, milli), and `avg_ot`/`std_ot`/`min_ot`/`max_ot`
    * (doubles in original units, 6 dp). Ties at one `tsUsCol` value all
    * join the frame (RANGE semantics), so the result is deterministic
    * under any tie order. Long envelope: the squared-sum holds to ~9e18 —
    * milli-values ≤ 5e4 keep it exact through per-key frames of ~3e9
    * samples; beyond that, escalate `sumsq_ot` to decimal(38,0). */
  def overTime(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
               milliCol: String, rangeUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty (keyless range " +
      "windows would plan a single-partition stage)")
    require(rangeUs > 0, "rangeUs must be positive")
    requireAbsent(df, Seq("cnt_ot", "sum_ot", "sumsq_ot", "avg_ot", "std_ot",
      "min_ot", "max_ot"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsUsCol))
      .rangeBetween(-rangeUs, 0L)
    val v = col(milliCol)
    // exact integer frame sums; the double math over them is a fixed
    // expression both engines evaluate identically
    val withSums = df
      .withColumn("cnt_ot", count(lit(1)).over(w))
      .withColumn("sum_ot", sum(v).over(w))
      .withColumn("sumsq_ot", sum(v * v).over(w))
      .withColumn("min_ot", round(min(v).over(w) / 1000.0, 6))
      .withColumn("max_ot", round(max(v).over(w) / 1000.0, 6))
    val mean = col("sum_ot").cast("double") / col("cnt_ot")
    val varPop = col("sumsq_ot").cast("double") / col("cnt_ot") - mean * mean
    withSums
      .withColumn("avg_ot", round(mean / 1000.0, 6))
      // clamp tiny negative fp residue (single-sample frames) before sqrt
      .withColumn("std_ot",
        round(sqrt(greatest(varPop, lit(0.0))) / 1000.0, 6))
      .drop("sumsq_ot")
  }

  /** Per-key least-squares line over the full sample range: PromQL
    * `deriv()` (slope) and `predict_linear()` (extrapolation
    * `horizonSec` past the last sample). One keyed window (per-key min
    * timestamp) + one keyed aggregate — Spark satisfies the aggregate's
    * distribution with the window's exchange, so ONE shuffle total.
    *
    * Slope from the textbook sums `(nΣxy − ΣxΣy) / (nΣxx − (Σx)²)` with
    * x = whole seconds since the key's first sample, y = milli-units.
    * Σxx/Σxy accumulate in DOUBLE, not LONG: at 10× scale the integer
    * Σxx passes 2.4e19 > Long.MaxValue and ANSI mode fails the job
    * (caught by the round-15 materialized-sink bench — the count
    * protocol pruned these columns for 8 rounds). Each product is exact
    * in double (x < 2^26 s, x·y < 2^53) and at oracle scale every
    * partial sum stays < 2^53, so double accumulation is bit-identical
    * to the old integer sums where the DuckDB compare runs; past 2^53
    * it degrades gracefully to ~1e-16 relative error instead of
    * throwing. Emits per-HOUR slope
    * (`deriv_per_hour`) so 6-dp rounding keeps signal; `predict_val` is in
    * original units. Keys with < 2 samples or zero time-variance yield
    * NULLs (slope undefined), matching SQL division-null semantics. */
  def derivPredict(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                   milliCol: String, horizonSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    requireAbsent(df, Seq("_t0", "_x", "n", "sx", "sy", "sxx", "sxy",
      "x_last", "deriv_per_hour", "predict_val"))
    val wKey = Window.partitionBy(keyCols.map(col): _*)
    val prepared = df
      .withColumn("_t0", min(col(tsUsCol)).over(wKey))
      // `div`, not `/`: Spark's / on longs is double division; backticks
      // keep non-identifier column names parseable
      .withColumn("_x", expr(s"(`$tsUsCol` - `_t0`) div 1000000"))
    val agg = prepared.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum("_x").as("sx"),
      sum(col(milliCol)).as("sy"),
      // cast BEFORE the product: the long product itself can overflow
      sum(col("_x").cast("double") * col("_x")).as("sxx"),
      sum(col("_x").cast("double") * col(milliCol)).as("sxy"),
      max("_x").as("x_last"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val num = n * col("sxy") - sx * sy
    val den = n * col("sxx") - sx * sx
    // den == 0 (single sample / constant x) -> NULL via nullif
    val slopeMilliPerSec = num / nullif(den, lit(0.0))
    val predictMilli =
      sy / n + slopeMilliPerSec * (col("x_last") + lit(horizonSec) - sx / n)
    agg
      .withColumn("deriv_per_hour", round(slopeMilliPerSec * 3.6, 6))
      .withColumn("predict_val", round(predictMilli / 1000.0, 6))
      .select(keyCols.map(col) ++ Seq(col("n"), col("deriv_per_hour"),
        col("predict_val")): _*)
  }

  /** The true windowed `rate(v[t])` / `increase(v[t])` form — the exact
    * shape of the reference's collection queries (config.yaml:17): at
    * every sample, the reset-aware counter increase summed over the
    * trailing `[ts − rangeUs, ts]` frame and its per-second rate over the
    * frame's actual sample span. Two window passes over ONE keyed
    * exchange (per-step increments vs the previous sample, then the
    * RANGE-frame sum + frame-start timestamp); integer-exact until the
    * final division. A key's first sample contributes increment 0 (no
    * predecessor), and single-sample frames emit NULL rate (zero span) —
    * SQL division-null semantics, mirrored by the oracle. */
  def rateWindow(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                 intCol: String, tieCol: String, rangeUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(rangeUs > 0, "rangeUs must be positive")
    requireAbsent(df, Seq("_inc", "_ts_first", "increase_w", "rate_w"))
    val wRow = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    val wRange = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol)).rangeBetween(-rangeUs, 0L)
    val v = col(intCol)
    val prev = lag(v, 1).over(wRow)
    df.withColumn("_inc", when(prev.isNull, lit(0L))
        .when(v < prev, v).otherwise(v - prev))
      .withColumn("increase_w", sum(col("_inc")).over(wRange))
      .withColumn("_ts_first", min(col(tsUsCol)).over(wRange))
      .withColumn("rate_w", round(col("increase_w") * lit(1000000.0) /
        nullif((col(tsUsCol) - col("_ts_first")).cast("double"), lit(0.0)),
        6))
      .drop("_inc", "_ts_first")
  }

  /** PromQL `resets()` and `changes()` over an integer series: per key,
    * how many adjacent-sample drops (counter restarts) and how many
    * adjacent-sample value changes. `ordCols` must totally order samples
    * within a key (include a unique tiebreaker). Integer-exact. */
  def resetsChanges(df: DataFrame, keyCols: Seq[String],
                    ordCols: Seq[String], intCol: String): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty,
      "keyCols and ordCols must be non-empty")
    requireAbsent(df, Seq("_prev", "resets", "changes"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    df.withColumn("_prev", lag(col(intCol), 1).over(w))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(col(intCol) < col("_prev"), 1L).otherwise(0L)).as("resets"),
        sum(when(col(intCol) =!= col("_prev"), 1L).otherwise(0L))
          .as("changes"))
  }

  /** PromQL gauge endpoints per key: `delta()` (last − first),
    * `idelta()` (last − penultimate) and `irate()` (idelta per second,
    * from the last two samples' timestamps). One keyed window computing
    * both row numbers, one keyed aggregate — single shuffle. Keys with a
    * single sample yield NULL idelta/irate (no penultimate sample). */
  def deltaIrate(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
                 milliCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    requireAbsent(df, Seq("_rna", "_rnd", "_v_first", "_v_last", "_v_prev",
      "_ts_last", "_ts_prev", "delta_val", "idelta_val", "irate_per_sec"))
    val wAsc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    val wDesc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol).desc, col(tieCol).desc)
    val v = col(milliCol)
    val tagged = df
      .withColumn("_rna", row_number().over(wAsc))
      .withColumn("_rnd", row_number().over(wDesc))
    tagged.groupBy(keyCols.map(col): _*).agg(
      max(when(col("_rna") === 1, v)).as("_v_first"),
      max(when(col("_rnd") === 1, v)).as("_v_last"),
      max(when(col("_rnd") === 2, v)).as("_v_prev"),
      max(when(col("_rnd") === 1, col(tsUsCol))).as("_ts_last"),
      max(when(col("_rnd") === 2, col(tsUsCol))).as("_ts_prev"))
      .withColumn("delta_val",
        round((col("_v_last") - col("_v_first")) / 1000.0, 6))
      .withColumn("idelta_val",
        round((col("_v_last") - col("_v_prev")) / 1000.0, 6))
      .withColumn("irate_per_sec",
        round((col("_v_last") - col("_v_prev")) * lit(1000.0) /
          nullif((col("_ts_last") - col("_ts_prev")).cast("double"),
            lit(0.0)), 6))
      .select(keyCols.map(col) ++ Seq(col("delta_val"), col("idelta_val"),
        col("irate_per_sec")): _*)
  }

  /** Exponentially-weighted moving average — the smoothing half of PromQL
    * `holt_winters()` / pandas `ewm(alpha).mean()` — in the bounded-lag
    * closed form: `Σ_{j=0..k-1} (1−α)^j · x_{t−j} / Σ_j (1−α)^j` over the
    * lags that exist (normalized like pandas `adjust=True`; truncated at k
    * terms, where the dropped tail weight is (1−α)^k — pick k so that's
    * below the 6-dp rounding floor). A recurrence would serialize per key;
    * this form is ONE keyed window pass with k lag columns, fully
    * parallel, and its weight literals are fixed doubles both engines
    * multiply identically.
    *
    * Returns the input plus `ewma_val` (original units, 6 dp). `ordCols`
    * must totally order samples within a key. */
  def ewma(df: DataFrame, keyCols: Seq[String], ordCols: Seq[String],
           milliCol: String, alpha: Double, k: Int): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty,
      "keyCols and ordCols must be non-empty")
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0, 1)")
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    requireAbsent(df, Seq("ewma_val"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    val weights = ewmaWeights(alpha, k)
    val v = col(milliCol)
    // lag(0) is the row itself — never null; missing earlier lags drop out
    // of numerator AND denominator (pandas adjust=True head behavior)
    val terms = weights.zipWithIndex.map { case (wt, j) =>
      val x = if (j == 0) v else lag(v, j).over(w)
      (when(x.isNotNull, x.cast("double") * wt).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val numer = terms.map(_._1).reduce(_ + _)
    val denom = terms.map(_._2).reduce(_ + _)
    df.withColumn("ewma_val", round(numer / denom / 1000.0, 6))
  }

  /** The `(1−α)^j` weight ladder, computed once in Scala so the SAME
    * double literals reach both the Spark plan and the SQL oracle text. */
  def ewmaWeights(alpha: Double, k: Int): Seq[Double] =
    Iterator.iterate(1.0)(_ * (1.0 - alpha)).take(k).toSeq

  /** [[ewma]] as ONE streaming pass — the q_quantile_ot promotion pattern
    * (round-19, verdict order #4): `repartition(key)` +
    * `sortWithinPartitions` (the exact exchange+sort the WindowExec plan
    * also pays) + a mapPartitions ring of the last k values, instead of a
    * WindowExec materializing k lag reads per row through interpreted
    * offset-frame readers.
    *
    * BIT-PARITY with [[ewma]] (spec-pinned in RatesSpec): the numerator
    * and denominator replicate the window form's left-fold exactly —
    * terms accumulated j = 0..k−1 in order, each
    * `present ? (double) v_j · w_j : 0.0` (a missing lag and a NULL value
    * both contribute literal 0.0 to BOTH sums, matching
    * `when(x.isNotNull, …).otherwise(0.0)`); the fold emits RAW
    * (numer, denom) columns and the `numer / denom / 1000.0` division
    * chain plus the 6-dp round run as the ENGINE's own expressions over
    * them — so division semantics (including ANSI mode's
    * DIVIDE_BY_ZERO error on an all-null frame, which the window form
    * raises too — spec-pinned) and rounding are never reimplemented.
    *
    * Projection contract (same as [[quantileOverTimeSliding]]): output is
    * EXACTLY `keyCols ++ ordCols :+ milliCol :+ ewma_val` — select other
    * columns in beforehand or join them back. `milliCol` must be
    * LongType (the exact-integer milli contract the registry row feeds);
    * `ordCols` must totally order samples within a key; BinaryType keys
    * are rejected (Array[Byte] reference equality would silently reset
    * the ring — same guard as quantileOverTimeSliding). */
  def ewmaSliding(df: DataFrame, keyCols: Seq[String], ordCols: Seq[String],
                  milliCol: String, alpha: Double, k: Int): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty,
      "keyCols and ordCols must be non-empty")
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0, 1)")
    require(k >= 1 && k <= 64, "k must be in [1, 64]")
    require(df.schema(milliCol).dataType == LongType,
      s"ewmaSliding requires a LongType value column; '$milliCol' is " +
        s"${df.schema(milliCol).dataType.simpleString}")
    keyCols.foreach(c => require(df.schema(c).dataType != BinaryType,
      s"ewmaSliding key column '$c' is BinaryType: Array[Byte] has " +
        "reference equality — cast to string or hash to long first"))
    requireAbsent(df, Seq("ewma_val"))
    val weights = ewmaWeights(alpha, k).toArray
    val cols = (keyCols ++ ordCols :+ milliCol).map(col)
    val sorted = df.select(cols: _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ ordCols).map(col): _*)
    // raw fold sums are non-null by construction: both whens default to
    // 0.0, same as the window form's fold
    val outSchema = sorted.schema
      .add("_ewma_numer", DoubleType, nullable = false)
      .add("_ewma_denom", DoubleType, nullable = false)
    val nKeys = keyCols.size
    val vIdx = sorted.schema.fields.length - 1
    val kk = k
    val raw = sorted.mapPartitions { it =>
      val vals = new Array[Double](kk)
      val has = new Array[Boolean](kk)
      var head = -1
      var count = 0 // rows seen for the current key, capped at kk
      var curKey: Array[Any] = null
      it.map { r =>
        var keyChanged = curKey == null
        if (!keyChanged) {
          var i = 0
          while (i < nKeys && !keyChanged) {
            if (r.get(i) != curKey(i)) keyChanged = true
            i += 1
          }
        }
        if (keyChanged) {
          curKey = Array.tabulate[Any](nKeys)(r.get)
          count = 0
        }
        head += 1
        if (head == kk) head = 0
        if (r.isNullAt(vIdx)) has(head) = false
        else {
          has(head) = true
          // the window form evaluates cast(v as double) per term; the
          // cast is a pure function of the long, so hoisting it to push
          // time cannot change any product
          vals(head) = r.getLong(vIdx).toDouble
        }
        if (count < kk) count += 1
        var numer = 0.0
        var denom = 0.0
        var j = 0
        while (j < kk) {
          if (j < count) {
            var ri = head - j
            if (ri < 0) ri += kk
            if (has(ri)) {
              numer += vals(ri) * weights(j)
              denom += weights(j)
            } else {
              numer += 0.0
              denom += 0.0
            }
          } else {
            numer += 0.0
            denom += 0.0
          }
          j += 1
        }
        Row.fromSeq(r.toSeq :+ numer :+ denom)
      }
    }(RowEncoder.encoderFor(outSchema))
    raw.select((keyCols ++ ordCols :+ milliCol).map(col) :+
      round(col("_ewma_numer") / col("_ewma_denom") / 1000.0, 6)
        .as("ewma_val"): _*)
  }

  /** PromQL `holt_winters()` — double (level + trend) exponential
    * smoothing, the Prometheus recurrence exactly (s₀ = x₀,
    * b₀ = x₁ − x₀; sᵢ = sf·xᵢ + (1−sf)(sᵢ₋₁ + bᵢ₋₁);
    * bᵢ = tf·(sᵢ − sᵢ₋₁) + (1−tf)·bᵢ₋₁). A per-key recurrence can't be a
    * window expression, so this is the scalable sequential shape:
    * `repartition(key)` + `sortWithinPartitions(key, ts)` +
    * ONE streaming `mapPartitions` fold — a single shuffle, no per-group
    * in-memory materialization (the external sort spills; the fold is
    * O(1) state per key), keys sharded across executors. Per-key sample
    * counts are unbounded.
    *
    * Emits `(key, ts, x, hw_level, hw_trend)`; each key's FIRST row has
    * NULL level/trend (the recurrence needs two samples to initialize —
    * Prometheus likewise requires ≥ 2 points). `tsCol` must be unique
    * within a key (pre-aggregate ties away — the bucketed series this
    * operates on already are), and `valCol` must be non-null (the typed
    * fold's primitive encoder rejects nulls loudly — drop or impute
    * upstream, exactly as Prometheus scrapes never carry null samples).
    * sf/tf are the smoothing/trend factors in
    * (0, 1); `1−sf`/`1−tf` are computed ONCE here so the oracle text can
    * embed the identical double constants. */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, sf: Double, tf: Double): DataFrame = {
    require(sf > 0.0 && sf < 1.0, "sf must be in (0, 1)")
    require(tf > 0.0 && tf < 1.0, "tf must be in (0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val omSf = 1.0 - sf
    val omTf = 1.0 - tf
    val out = df
      .select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        col(valCol).cast("double"))
      .as[(String, Long, Double)]
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { it =>
        var curKey: String = null
        var n = 0L
        var prevS = 0.0
        var prevB = 0.0
        it.map { case (k, ts, x) =>
          if (k != curKey) { curKey = k; n = 0L }
          n += 1
          if (n == 1L) {
            prevS = x; prevB = 0.0
            (k, ts, x, Option.empty[Double], Option.empty[Double])
          } else {
            if (n == 2L) prevB = x - prevS // b0 = x1 - x0
            val s = sf * x + omSf * (prevS + prevB)
            val b = tf * (s - prevS) + omTf * prevB
            prevS = s; prevB = b
            (k, ts, x, Some(s), Some(b))
          }
        }
      }
    out.toDF(keyCol, tsCol, valCol, "hw_level", "hw_trend")
  }

  /** PromQL `quantile_over_time` over a trailing `frameRows`-row frame —
    * the one-pass sliding order-statistics plan behind `q_quantile_ot`
    * (bit-identical twin of
    * `percentile(v, p).over(rowsBetween(-frameRows+1, 0))`).
    *
    * Why it replaced the window plan (round-16 adjudication, BASELINE.md
    * r16 item 4): the window plan re-aggregates the whole frame for EVERY row — Spark's
    * exact `Percentile` builds and sorts a counts map per output row, so
    * the materialized cost is O(rows · frame log frame) interpreted
    * work; it is q_quantile_ot's 33× count-vs-noop divergence. This twin
    * pays one keyed exchange + an in-partition sort (the exact exchange
    * the window plan also needs), then ONE pass per partition with a
    * ≤frameRows sorted buffer: binary-search insert/evict per row,
    * O(rows · frame) memmove at frame=50 ≈ ns-scale per row, all inside
    * a single mapPartitions. State is bounded by the frame, so the shape
    * holds at any scale; keys are hash-partitioned, so 100 TB splits by
    * key exactly like the window plan.
    *
    * Numeric contract: REPLICATES Spark's `Percentile` bit-for-bit
    * (parity spec) — nulls occupy frame slots but not the order
    * statistics; an all-null frame yields NULL; interpolation is the
    * engine's exact `lower·(hi−pos) + higher·(pos−lo)` at
    * pos = p·(n−1), evaluated in the same operation order.
    *
    * PROMOTED round 17 (was the `duplicatedSpansChunked`-style held-back
    * twin in r16): registered as the plan behind `q_quantile_ot` on the
    * bit-parity spec (frames 1–50, p .25/.5/.9, null shapes) plus the
    * banked noop-vs-noop records — 3.9× at sf0.1, 8.9× at 10×
    * (`bench/r16/QUANTILE_SLIDING_{sf01,ld1}_r16.json`).
    *
    * Projection contract: the output is EXACTLY
    * `keyCol ++ orderCols :+ valueCol :+ q_ot` (double, nullable) — any
    * other input column is dropped, by design: the one-pass buffer keys
    * its ring on ordinal positions, and callers that need more columns
    * join back on (key, order) or select them in beforehand. The value
    * column must be LongType (the order-statistics ring stores primitive
    * longs — the exact-integer contract the registry row feeds it). */
  def quantileOverTimeSliding(df: DataFrame, keyCol: String,
      orderCols: Seq[String], valueCol: String, frameRows: Int,
      p: Double): DataFrame = {
    require(frameRows > 0, s"frameRows must be positive, got $frameRows")
    require(p >= 0.0 && p <= 1.0, s"quantile must be in [0,1], got $p")
    require(df.schema(valueCol).dataType == LongType,
      s"quantileOverTimeSliding requires a LongType value column; " +
        s"'$valueCol' is ${df.schema(valueCol).dataType.simpleString} — " +
        s"cast it to long (exact integers) before calling")
    // Key-change detection below compares r.get(0) with ==; for BinaryType
    // that is Array[Byte] REFERENCE equality, so every row would reset the
    // frame and quantiles would be silently wrong (frame size 1). All
    // other external types (string/numeric/Seq/Row/Map) have value
    // equality. Cast binary keys to string (or hash to long) first.
    require(df.schema(keyCol).dataType != BinaryType,
      s"quantileOverTimeSliding key column '$keyCol' is BinaryType: " +
        "Array[Byte] has reference equality, which would reset the frame " +
        "on every row — cast the key to string or hash it to long first")
    requireAbsent(df, Seq("q_ot"))
    val cols = (Seq(keyCol) ++ orderCols :+ valueCol).map(col)
    val sorted = df.select(cols: _*)
      .repartition(col(keyCol))
      .sortWithinPartitions((Seq(keyCol) ++ orderCols).map(col): _*)
    val outSchema = sorted.schema.add("q_ot", DoubleType, nullable = true)
    val vIdx = sorted.schema.fields.length - 1
    sorted.mapPartitions { it =>
      // per-key sliding state: ring of the last frameRows slots (null
      // slots included — they age out of the frame like any row) and a
      // sorted multiset of the non-null values, both frame-bounded
      val ringV = new Array[Long](frameRows)
      val ringNull = new Array[Boolean](frameRows)
      var head = 0
      var filled = 0
      val ord = new Array[Long](frameRows)
      var ordN = 0
      var curKey: Any = None // sentinel unequal to any column value
      def insertOrd(v: Long): Unit = {
        val i = java.util.Arrays.binarySearch(ord, 0, ordN, v)
        val at = if (i >= 0) i else -(i + 1)
        System.arraycopy(ord, at, ord, at + 1, ordN - at)
        ord(at) = v
        ordN += 1
      }
      def removeOrd(v: Long): Unit = {
        val at = java.util.Arrays.binarySearch(ord, 0, ordN, v)
        System.arraycopy(ord, at + 1, ord, at, ordN - at - 1)
        ordN -= 1
      }
      // Spark Percentile.getPercentile's exact arithmetic: position on
      // n−1, floor/ceil ranks, lower·(hi−pos) + higher·(pos−lo)
      def quantile(): Any =
        if (ordN == 0) null
        else {
          val pos = p * (ordN - 1)
          val lo = math.floor(pos).toInt
          val hi = math.ceil(pos).toInt
          if (lo == hi) ord(lo).toDouble
          else ord(lo).toDouble * (hi - pos) + ord(hi).toDouble * (pos - lo)
        }
      it.map { r =>
        val k = r.get(0)
        if (k != curKey) {
          curKey = k; head = 0; filled = 0; ordN = 0
        }
        if (filled == frameRows) { // evict the slot leaving the frame
          if (!ringNull(head)) removeOrd(ringV(head))
        } else filled += 1
        val isNull = r.isNullAt(vIdx)
        ringNull(head) = isNull
        if (!isNull) {
          val v = r.getLong(vIdx)
          ringV(head) = v
          insertOrd(v)
        }
        head = (head + 1) % frameRows
        Row.fromSeq(r.toSeq :+ quantile())
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
