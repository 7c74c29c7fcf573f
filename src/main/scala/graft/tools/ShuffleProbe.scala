package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query SHUFFLE-VOLUME scaling evidence — the complement of
  * the wall-time ratios in `SCALE_sf1_ratios.txt`. Wall time at local[32]
  * conflates compute with exchange; on a real cluster the exchange is the
  * scarce resource, so the 100 TB question is "do shuffle bytes grow
  * LINEARLY with input?". A query whose shuffle bytes/row grows with SF
  * has a hidden fan-out (pair blow-up, skewed repartition) that wall time
  * on one box can hide.
  *
  * Mechanism: a SparkListener accumulates stage-level shuffle read/write,
  * spill, and input bytes between markers; each named registry query runs
  * against two SF dirs (steady second rep, `clearCache` between reps) and
  * the tool prints bytes + bytes-ratio per query. Run:
  * {{{ runMain graft.tools.ShuffleProbe /root/testdata/sf0.1 .scratch/sf1 q_a,q_b }}} */
object ShuffleProbe {

  final class Acc extends SparkListener {
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    val spill = new AtomicLong; val input = new AtomicLong
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def reset(): Unit = Seq(shufWrite, shufRead, spill, input).foreach(_.set(0))
  }

  // shuffle-heaviest registry rows: joins, banded pair joins, window/
  // bucketed twins, holistic aggs — the plans whose exchanges would be
  // the cluster bottleneck
  private val DefaultOps = Seq(
    "q3_shipping", "q_join_shuffle", "q_join_skewed", "q_minhash_lsh_md5",
    "q_simhash_pairs", "q_dup_spans", "q_neardup_clusters",
    "q_window_w2_partitioned", "q_ffill_bucketed_w1", "q_scale_robust",
    "q_tfidf_topk", "q_bigram_ppl", "q_pack_bins_bucketed", "q_semdedup")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleProbe <sfDirA> <sfDirB> [q,...]")
    val dirs = Seq(args(0), args(1))
    val ops = if (args.length > 2) args(2).split(",").map(_.trim).toSeq
      else DefaultOps
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SQUEEZE mode: starve the unified memory manager (fraction 0.05 ≈
    // a few hundred MB of execution+storage across 32 cores) and narrow
    // the shuffle to 4 partitions so each task holds 8× the rows — the
    // graceful-degradation drill. Pass = queries COMPLETE with
    // diskBytesSpilled > 0 where sorts/aggs exceed memory, instead of
    // OOM: the cluster-sizing claim ("partitions that overflow executor
    // memory spill, they don't kill the job") made measurable.
    val squeeze = sys.env.get("SPARK_GRAFT_SQUEEZE").exists(_ == "1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", if (squeeze) "4" else cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
    val spark = (if (squeeze) builder.config("spark.memory.fraction", "0.05")
      else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    def measure(q: String, dir: String): Map[String, Long] = {
      val fn = graft.SparkEntry.queries(q)
      // steady second rep: rep 1 pays codegen/JIT; metrics from rep 2 only
      (1 to 2).map { rep =>
        spark.catalog.clearCache()
        acc.reset()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        // listener delivery is async (the bus drain API is private[spark]);
        // poll until the counters stop moving before reading them
        var prev = -1L
        var cur = acc.shufWrite.get + acc.input.get
        while (prev != cur) {
          Thread.sleep(200)
          prev = cur; cur = acc.shufWrite.get + acc.input.get
        }
        Map("shuf_write" -> acc.shufWrite.get, "shuf_read" -> acc.shufRead.get,
          "spill" -> acc.spill.get, "input" -> acc.input.get)
      }.last
    }

    ops.foreach { q =>
      try {
        val Seq(a, b) = dirs.map(measure(q, _))
        def ratio(k: String): String =
          if (a(k) == 0L) if (b(k) == 0L) "1.00" else "inf"
          else f"${b(k).toDouble / a(k)}%.2f"
        println(s"""{"q":"$q","a":{"input":${a("input")},"shuf_write":${a("shuf_write")},"spill":${a("spill")}},""" +
          s""""b":{"input":${b("input")},"shuf_write":${b("shuf_write")},"spill":${b("spill")}},""" +
          s""""input_ratio":${ratio("input")},"shuf_ratio":${ratio("shuf_write")}}""")
      } catch {
        case e: Throwable => println(s"""{"q":"$q","error":"${e.getMessage.take(120)}"}""")
      }
    }
    spark.stop()
  }
}
