package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index persistence — build ONCE, search MANY. [[Ann.ivfTopKKmeans]]
  * retrains the quantizer and re-assigns the corpus on every call, which
  * is right for a one-shot query but wrong for a served index: at 10⁹
  * vectors the k-means pass and the assignment scan dwarf any single
  * search. This module splits the lifecycle the way a served ANN system
  * does (and the way S8/S9 split scaler/model fit from apply):
  *
  *  - [[build]] trains the deterministic fixed-point quantizer
  *    ([[Ann.kmeansCentroidsFixedPoint]] — same init, same integer Lloyd
  *    iterations as the oracle-checked query path), assigns every corpus
  *    vector to its cell (map-only; centroids are plan literals), and
  *    writes TWO parquet tables: `centroids/` (k rows of exact
  *    integer-grid centroid components) and `cells/`, the assigned
  *    corpus PARTITIONED BY CELL — probe-time partition pruning is the
  *    whole point of an on-disk IVF layout: a search probing nprobe
  *    cells reads nprobe directories and never scans the rest.
  *  - [[search]] loads the k-row centroid table to the driver (k·dims
  *    longs — driver-sized by construction), picks each query's nprobe
  *    nearest cells with the same exact integer distances as the build,
  *    and exact-scores ONLY the probed partitions (`_cell IN (...)`
  *    reaches the parquet source as a partition filter).
  *
  * The index is exactly reproducible: rebuilding from the same corpus
  * bit-matches (deterministic init + integer arithmetic), and a search
  * against the persisted index returns the SAME rows as the in-memory
  * [[Ann.ivfTopKKmeans]] with the same parameters — IvfIndexSpec pins
  * both, plus the partition-pruning plan contract. */
object IvfIndex {

  /** Train the quantizer and persist `centroids/` + cell-partitioned
    * `cells/` under `path`. Returns the number of non-empty cells. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, path: String,
            centers: Int = 8, iters: Int = 2): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Ann.kmeansCentroidsFixedPoint(corpus, idCol, vecCol,
      centers, iters)
    cents.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1) // k rows — one footer beats k tiny files
      .write.mode("overwrite").parquet(s"$path/centroids")
    corpus
      .withColumn("_cell", Ann.nearestCellInt(Ann.quantize3(col(vecCol)), cents))
      .select(col(idCol), col(vecCol), col("_cell"))
      .write.mode("overwrite").partitionBy("_cell").parquet(s"$path/cells")
    cents.size
  }

  /** The persisted centroid table as the driver-side Seq the search and
    * any re-assignment path consume — k·dims longs, never corpus-sized. */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Int, Array[Long])] =
    spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
      .toSeq

  /** Top-k cosine search against a persisted index: nprobe cells per
    * query (exact integer probe distances, ascending-cell tiebreak —
    * identical to the build's assignment rule), then exact cosine over
    * ONLY the probed partitions. Queries must be driver-small (they
    * broadcast, as in every Ann search). */
  def search(queries: DataFrame, qidCol: String, qvecCol: String,
             spark: SparkSession, path: String,
             k: Int, nprobe: Int = 2): DataFrame = {
    val cents = loadCentroids(spark, path)
    require(cents.nonEmpty, s"no centroids at $path")
    val cells = spark.read.parquet(s"$path/cells")
    val idCol = cells.columns(0)
    val vecCol = cells.columns(1)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("_s.d"), col("_s.cell"))
    val probes = queries
      .select(col(qidCol), col(qvecCol),
        explode(Ann.cellScores(Ann.quantize3(col(qvecCol)), cents)).as("_s"))
      .withColumn("_rk", row_number().over(wq))
      .filter(col("_rk") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("_s.cell").as("_cell"))
      // materialized once (eager, reference-tracked): the k-literal
      // distance explode otherwise re-runs for the driver collect below
      // AND the broadcast join side
      .localCheckpoint(true)
    val probedCells = probes.select("_cell").distinct()
      .collect().map(_.getInt(0)) // ≤ queries × nprobe — driver-sized
    val joined = cells
      .filter(col("_cell").isin(probedCells.toSeq: _*)) // partition pruning
      .join(broadcast(probes), Seq("_cell"))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("cosine", Ann.cosine(col(qvecCol).cast("array<double>"),
        col(vecCol).cast("array<double>")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }
}
