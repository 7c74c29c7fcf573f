package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The behavioral quality row's machinery: fixture arithmetic, label
  * isolation, and the frozen artifact's decision margins (the claims
  * `q_detect_quality`'s oracle enforces end-to-end at sf0.01). */
class DetectQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("spikedSeries plants exactly every SpikePeriod-th series row, +magnitude in scaled units") {
    val clean = DetectQuality.cleanSeries(spark, dir)
    val sp = DetectQuality.spikedSeries(clean)
    val joined = clean.select(col("ts_min"), col("v").as("cv"))
      .join(sp, Seq("ts_min"))
    val planted = joined.filter(col("is_spike") === 1.0)
    // rank-based planting: every 97th row of the ordered series
    val n = clean.count()
    assert(planted.count() == (n - 1) / DetectQuality.SpikePeriod + 1)
    // spiked rows shifted by exactly the magnitude; clean rows untouched
    assert(planted.filter(
      abs(col("v") - col("cv") - DetectQuality.SpikeMagnitude) > 1e-12).count() == 0)
    assert(joined.filter(col("is_spike") === 0.0)
      .filter(col("v") =!= col("cv")).count() == 0)
    // clean series is min-max scaled: range exactly [0, 1]
    val mm = clean.agg(min("v"), max("v")).as[(Double, Double)].head()
    assert(mm._1 == 0.0 && mm._2 == 1.0)
  }

  test("frozen artifact: trained margins separate clean from spiked at the threshold (recall = precision = 1)") {
    val rep = DetectQuality.qualityReport(spark, dir).collect().head
    val (nWin, nFlag) = (rep.getLong(0), rep.getLong(1))
    assert(nWin > 0 && nFlag > 0, s"degenerate fixture: $rep")
    assert(rep.getDouble(2) == 1.0, s"spike recall: $rep")
    assert(rep.getDouble(3) == 1.0, s"clean precision: $rep")
    // the arithmetic ground truth (window_id alone) must equal the
    // exists-over-window-members read — the formula regression guard
    val sp = DetectQuality.spikedSeries(DetectQuality.cleanSeries(spark, dir))
    val wins = graft.operators.Windows.slidingWindowsPartitioned(sp,
      Seq("ts_min"), Seq("v", "is_spike"), graft.Pipeline.SeqLen)
    val mismatches = wins.select(col("window_id"),
        exists(col("window"), w => w("is_spike") === lit(1.0)).as("e"))
      .withColumn("a", DetectQuality.truthFromId(col("window_id")))
      .filter(col("e") =!= col("a")).count()
    assert(mismatches == 0, s"arithmetic truth diverges on $mismatches windows")
  }

  test("an UNTRAINED model fails the quality bar — the row certifies training, not plumbing") {
    val sp = DetectQuality.spikedSeries(DetectQuality.cleanSeries(spark, dir))
    val wins = graft.operators.Windows.slidingWindowsPartitioned(sp,
      Seq("ts_min"), Seq("v", "is_spike"), graft.Pipeline.SeqLen)
    val truth = wins.select(col("window_id"),
      exists(col("window"), w => w("is_spike") === lit(1.0)).as("t"))
    val glorot = Lstm.glorotInit(1, seed = 42L)
    val scored = graft.Pipeline.scoreWindows(spark,
      wins.select("window_id", "window"), Seq("v"), glorot)
    val falsePos = scored.join(truth, Seq("window_id"))
      .filter(!col("t") && col("mse") > DetectQuality.Threshold).count()
    assert(falsePos > 0,
      "glorot-noise weights should flood clean windows past the threshold")
  }
}
