package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ index persistence — the compressed sibling of [[IvfIndex]], same
  * build-once / search-many lifecycle split. A product-quantization
  * index is MADE to be persisted: the codes table is m bytes per vector
  * against dims floats for the corpus (32× smaller at m=8/dims=64), and
  * the entire ADC search reads nothing else — the persisted layout IS
  * the 10⁹-vector memory story, not an optimization of it.
  *
  *  - [[build]] trains the m codebooks ([[Ann.pqTrain]] — deterministic
  *    md5-seeded farthest-first init + exact-integer Lloyd, identical
  *    to the oracle-checked `q_pq_codes` machinery), codes the corpus
  *    map-only, and writes `codebooks/` (m·ksub rows of integer-grid
  *    centroids) + `codes/` ((id, code_0..code_{m-1}) — no vectors).
  *  - [[search]] loads the codebooks to the driver (m·ksub·dims/m longs
  *    — driver-sized), then runs the ADC scan over the codes table via
  *    [[Ann.adcTopKFromCodes]]; with `rerankFrom` set, the ADC
  *    shortlist's full vectors are read from THAT corpus table (the
  *    index itself never stores them — the two-tier IVF-PQ read path,
  *    where only `rerank` rows per query touch real vectors).
  *
  * Rebuilds bit-match (deterministic init + integer arithmetic), and a
  * persisted search returns exactly what the in-memory [[Ann.pqTopK]] /
  * [[Ann.pqTopKRerank]] return with the same parameters — PqIndexSpec
  * pins both. */
object PqIndex {

  /** Train + code + persist under `path`. Returns m (the code width). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            m: Int = 8, ksub: Int = 8, iters: Int = 2,
            dims: Int = 64): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cbooks = Ann.pqTrain(corpus, idCol, vecCol, m, ksub, iters, dims)
    cbooks.zipWithIndex.flatMap { case (book, j) =>
      book.map { case (cell, c) => (j, cell, c.toSeq) }
    }.toSeq.toDF("sub", "cell", "centroid")
      .coalesce(1) // m·ksub rows — one footer beats many tiny files
      .write.mode("overwrite").parquet(s"$path/codebooks")
    Ann.pqCodesWith(corpus, idCol, vecCol, cbooks, dims)
      .drop("recon_err")
      .write.mode("overwrite").parquet(s"$path/codes")
    m
  }

  /** Incremental append — code a new batch with the FROZEN codebooks
    * (map-only; the codebooks ride as plan literals exactly as in build)
    * and append to `codes/`. O(batch), no retrain, no base re-code; the
    * ADC search sees the new rows with zero further work. Codebook
    * staleness is measurable the same way as [[IvfIndex.staleness]] —
    * compare the batch's recon_err distribution to the build's (the
    * `q_embed_drift` posture); a drifted batch reconstructing worse than
    * the build population is the retrain signal. Returns rows appended. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             spark: SparkSession, path: String, dims: Int = 64): Long = {
    val cbooks = loadCodebooks(spark, path)
    require(cbooks.nonEmpty, s"no codebooks at $path")
    // count on the write job (CollectMetrics) — see IvfIndex.append for
    // why a trailing batch.count() is the wrong shape
    val obs = org.apache.spark.sql.Observation()
    Ann.pqCodesWith(batch, idCol, vecCol, cbooks, dims)
      .drop("recon_err")
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/codes")
    obs.get("n").asInstanceOf[Long]
  }

  /** The persisted codebooks as the driver-side shape every PQ consumer
    * takes — indexed by subspace, cells ascending. */
  def loadCodebooks(spark: SparkSession, path: String)
      : Array[Seq[(Int, Array[Long])]] = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, book) =>
      book.sortBy(_._2).map(b => (b._2, b._3)).toSeq
    }.toArray
  }

  /** ADC top-k against the persisted codes; `rerankFrom` upgrades the
    * shortlist to an exact cosine rank read from the given corpus table
    * (`rerank` candidates per query — only those rows read vectors). */
  def search(queries: DataFrame, qidCol: String, qvecCol: String,
             spark: SparkSession, path: String, k: Int, dims: Int = 64,
             rerankFrom: Option[(DataFrame, String, String)] = None,
             rerank: Int = 50): DataFrame = {
    val cbooks = loadCodebooks(spark, path)
    require(cbooks.nonEmpty, s"no codebooks at $path")
    val codes = spark.read.parquet(s"$path/codes")
    val idCol = codes.columns(0)
    rerankFrom match {
      case None =>
        Ann.adcTopKFromCodes(queries, qidCol, qvecCol, codes, idCol,
          cbooks, k, dims)
      case Some((corpus, cid, cvec)) =>
        require(rerank >= k, s"rerank pool $rerank must cover k=$k")
        val cand = Ann.adcTopKFromCodes(queries, qidCol, qvecCol, codes,
            idCol, cbooks, rerank, dims)
          .select(col(qidCol), col(idCol).as(cid))
        val joined = corpus.select(col(cid), col(cvec).as("_cv"))
          .join(broadcast(cand), Seq(cid))
          .join(broadcast(queries.select(col(qidCol), col(qvecCol).as("_qv"))),
            Seq(qidCol))
          .withColumn("cosine", Ann.cosine(col("_qv").cast("array<double>"),
            col("_cv").cast("array<double>")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(cid))
        joined.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col(qidCol), col(cid), col("cosine"), col("rank"))
    }
  }
}
