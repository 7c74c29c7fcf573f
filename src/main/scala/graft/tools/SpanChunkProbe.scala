package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool (round-14 order #5): MEASURE the chunked anchored self-join
  * for duplicated-span mining against the one-join form, at the scale
  * where the one-join form spills (the 1000× rung read 14.8× wall for
  * 10× data, attributed to banded-join spill racing one disk).
  *
  * `Dedup.duplicatedSpansChunked` iterates the self-join over
  * `pmod(xxhash64(shingle), C)` slices, materializing each slice's
  * pair-match rows to zstd parquet scratch before the next starts —
  * peak join scratch ≈ 1/C of the full join's, at the cost of C extra
  * scans of the checkpointed anchored table. Promotion rule: ≥1.5×
  * at sf100 with the sf0.1 row in-noise, else bank the "not worth it".
  *
  * Usage:
  * {{{ runMain graft.tools.SpanChunkProbe <sfDir> <mode: base|chunk> [chunks] [reps] }}}
  * (modes run in separate invocations so each gets a fresh JVM/scratch —
  * the base form at sf100 writes tens of GB of spill; sharing a session
  * would let one mode's page-cache/disk debt bleed into the other's) */
object SpanChunkProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SpanChunkProbe <sfDir> <base|chunk> [chunks] [reps]")
    val sfDir = args(0)
    val mode = args(1)
    val chunks = if (args.length > 2) args(2).toInt else 8
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def build(): DataFrame = mode match {
      case "base" =>
        graft.dedup.Dedup.duplicatedSpans(
          graft.Tables.documents(spark, sfDir), "doc_id", "text",
          k = 3, maxDf = 5, minSpan = 5,
          checkpoint = graft.Queries.shingleCheckpoint(spark, sfDir))
      case "chunk" =>
        graft.dedup.Dedup.duplicatedSpansChunked(
          graft.Tables.documents(spark, sfDir), "doc_id", "text",
          k = 3, maxDf = 5, minSpan = 5, chunks = chunks,
          checkpoint = graft.Queries.shingleCheckpoint(spark, sfDir),
          chunkSink = (df, c) => {
            // zstd scratch per slice, freed with the whole dir at exit;
            // 32 MB row groups + no dictionary for the same writer-memory
            // reasons as the anchored-table checkpoint
            val path = graft.Queries.scratchDir(f"graft_spanchunk_$c%03d")
            df.write.mode("overwrite").option("compression", "zstd")
              .option("parquet.block.size", (32L << 20).toString)
              .option("parquet.enable.dictionary", "false")
              .parquet(path)
            spark.read.parquet(path)
          })
      case other => sys.error(s"bad mode $other")
    }

    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val n = build().count()
      val dt = (System.nanoTime() - t0) / 1e9
      try { spark.catalog.clearCache() } catch { case _: Throwable => () }
      System.err.println(f"[spanchunk] rep $i: $dt%.1f s, $n pair rows")
      (dt, n)
    }
    val steady = times.map(_._1).drop(1) match {
      case Nil => times.head._1
      case xs  => xs.sorted.apply(xs.size / 2)
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"probe":"span_chunk","sf":"$sfDir","mode":"$mode","chunks":${if (mode == "chunk") chunks else 1},"reps":$reps,"first_s":${times.head._1}%.3f,"steady_s":$steady%.3f,"rows":${times.head._2},"load_avg":$load%.2f}""")
    spark.stop()
  }
}
