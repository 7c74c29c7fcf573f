package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool (round-17 order #6): the permanent adjudication probe for
  * `q_table_profile`'s 24× count-vs-noop divergence — materialized
  * (noop-sink) price of the EXACT profile (`Profile.profile`, the
  * registry row: multi-countDistinct Expand, ×n_cols rows into the
  * aggregate) vs the APPROX twin (`Profile.profileApprox`,
  * HyperLogLog++ `approx_count_distinct`: no Expand, ×1 rows, constant
  * sketch state per column). Same output schema; `ProfileSpec` pins the
  * non-distinct fields identical and the HLL counts within rsd.
  *
  * Decision rule (VERDICT r16 order #6): promote the approx twin to a
  * bench-only production-twin row ONLY on a ≥1.5× steady record here;
  * otherwise the BASELINE.md divergence table carries this record as
  * the final word and the 24× row stops re-surfacing.
  *
  * Usage: {{{ runMain graft.tools.TableProfileProbe <sfDir> [reps] }}} */
object TableProfileProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TableProfileProbe <sfDir> [reps]")
    val sfDir = args(0)
    // min 2: `median(times.tail)` below needs at least one steady rep
    // (reps=1 would index an empty seq) — same clamp Flagship applies
    val reps = math.max(2, if (args.length > 1) args(1).toInt else 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try { spark.read.parquet(s"$sfDir/orders.parquet").limit(100).count() }
    catch { case _: Throwable => () }

    // the registry row's exact input (Queries.scala q_table_profile)
    def orders: DataFrame = graft.Tables.orders(spark, sfDir)

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def run(label: String, plan: () => DataFrame): String = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        plan().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val steady = median(times.tail)
      f""""$label":{"first_s":${times.head}%.3f,"steady_s":$steady%.3f}"""
    }
    val rows = Seq(
      "exact" -> (() => graft.operators.Profile.profile(orders)),
      "approx" -> (() => graft.operators.Profile.profileApprox(orders)))
      .map { case (l, p) => run(l, p) }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"table_profile","sf":"$sfDir","reps":$reps,"sink":"noop","load_avg":$load%.2f,${rows.mkString(",")}}""")
    spark.stop()
  }
}
