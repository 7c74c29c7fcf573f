package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 attribution probe (verdict order #6): run each flagship
  * prefix at WARN log level and count `WindowExec: No Partition Defined`
  * emissions per stage, so every single-partition window in the entry
  * path is attributable to a call site instead of a tail of anonymous
  * warnings. Uses a custom log4j appender on the WindowExec logger. */
object EntryWarnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Markers go to STDERR — the same stream WindowExec's WARN lands on —
    // so the interleaved log attributes each warning to the enclosing
    // BEGIN/END block. (A log4j2 appender on the root logger does not see
    // Spark's logger hierarchy here; stream interleaving does.)
    def block(label: String)(act: => Unit): Unit = {
      System.err.println(s"[warnprobe] BEGIN $label")
      System.err.flush()
      act
      System.err.println(s"[warnprobe] END $label")
      System.err.flush()
    }
    // calibration: a registry row with a single-partition window BY
    // DESIGN must emit the warning inside its block
    args.lift(1).foreach { q =>
      block(s"calibration:$q") {
        graft.SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.Pipeline.flagshipPrefixes(spark, dir).foreach { case (name, mk) =>
      block(s"stage:$name") {
        // noop, not count: count() lets Catalyst PRUNE an unreferenced
        // window, hiding exactly the operator this probe attributes
        mk().write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
