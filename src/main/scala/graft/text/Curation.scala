package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged curation DAG — the operating mode of a 100 TB curation run.
  *
  * `q_curation_pipeline` composes dedup → quality gate → sample → chunk
  * as ONE Catalyst plan, which is the right shape for a single-consumer
  * query. Production curation does not run that way: each stage artifact
  * is a deliverable (audited, versioned, re-consumed by several
  * downstream jobs), a multi-day DAG must be resumable at stage
  * boundaries, and a checkpoint bounds lineage so one flaky stage never
  * re-executes the whole corpus scan. This module runs the SAME chain
  * with a parquet write + re-read between stages and records per-stage
  * wall time and row counts — the write-amplification the single-plan
  * row hides is exactly what SCALE.md's sf1 run measures.
  *
  * Result-parity contract: every stage filter is per-row (dedup keeper
  * rule, repetition gate, hash sample), so computing it on the previous
  * stage's artifact equals computing it on the full corpus restricted to
  * that artifact — the staged report is row-identical to
  * `q_curation_pipeline`, and the registry twin shares that oracle
  * string verbatim.
  */
object Curation {

  /** One executed stage: artifact path + (optional) rows and wall. */
  final case class StageRun(name: String, path: String, rowsOut: Long,
                            wallSec: Double)

  /** The staged run: per-stage records plus the final per-language
    * (n_chunks, sum_tokens) report read from the LAST artifact. */
  final case class StagedResult(stages: Seq[StageRun], report: DataFrame)

  /** Run the three-stage DAG under `root`. `countRows = true` adds one
    * count job per stage for the scale probe's rows-in/out table (the
    * registry twin leaves it off — the driver's compare only consumes
    * the report). */
  def stagedPipeline(spark: SparkSession, dir: String, root: String,
                     countRows: Boolean = false): StagedResult = {
    val docs = graft.Tables.documents(spark, dir)
    val runs = scala.collection.mutable.ArrayBuffer[StageRun]()

    def stage(name: String, df: DataFrame): DataFrame = {
      val path = s"$root/$name"
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(path)
      val out = spark.read.parquet(path)
      val rows = if (countRows) out.count() else -1L
      runs += StageRun(name, path, rows, (System.nanoTime() - t0) / 1e9)
      out
    }

    // stage 1 — exact dedup, keep the highest-quality duplicate
    // (longest text, ties to smallest id): one fingerprint-keyed shuffle
    val s1 = stage("s1_dedup",
      graft.dedup.Dedup.exactDedupSurvivorsByQuality(
          docs, "doc_id", "text", "n_chars")
        .select("doc_id", "lang", "text"))

    // stage 2 — repetition quality gate + deterministic 50% hash sample,
    // both per-row, computed ON THE STAGE-1 ARTIFACT (never re-reading
    // stage 0 — the property that makes stages independently schedulable)
    val fluent = TextStats.repetitionSignals(s1, "doc_id", "text")
      .filter(col("distinct_ratio") >= 0.5).select("doc_id")
    val s2 = stage("s2_quality_sample",
      Sampling.sampleByHash(
        s1.join(fluent, Seq("doc_id"), "left_semi"), "doc_id", 0.5))

    // stage 3 — context chunking (32-token windows, stride 16); lang
    // rides from the stage-2 artifact
    val s3 = stage("s3_chunks",
      TextStats.chunkTokens(s2, "doc_id", "text", 32, 16)
        .join(s2.select("doc_id", "lang"), Seq("doc_id"))
        .select("doc_id", "chunk_no", "lang", "n_tokens"))

    StagedResult(runs.toSeq,
      s3.groupBy("lang")
        .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang"))
  }
}
