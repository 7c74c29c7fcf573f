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
    * `cells/` under `path`. Rows are stamped `_gen = 0` (build
    * generation); [[append]] stamps later generations so [[staleness]]
    * can compare quantization error across them. Returns the number of
    * non-empty cells. */
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
    // one-row meta table pinning the id/vector column NAMES: readers used
    // to infer the vector column positionally (columns(1)), which silently
    // reads the wrong column if a future writer reorders the projection
    Seq((idCol, vecCol)).toDF("id_col", "vec_col")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    corpus
      .withColumn("_cell", Ann.nearestCellInt(Ann.quantize3(col(vecCol)), cents))
      .select(col(idCol), col(vecCol), lit(0L).as("_gen"), col("_cell"))
      .write.mode("overwrite").partitionBy("_cell").parquet(s"$path/cells")
    cents.size
  }

  /** The persisted (idCol, vecCol) names; a pre-meta index (built before
    * the meta table existed) falls back to the original positional layout
    * `(id, vec, [_gen], _cell=partition)` — correct for every index this
    * module's own [[build]] ever wrote. `cells` is BY-NAME: the fallback
    * needs a schema read over the whole partitioned cells tree (file
    * listing + footer merge — O(index) metadata), and a post-round-10
    * index must not pay it on every O(batch) append just to discard it. */
  private def loadMeta(spark: SparkSession, path: String,
                       cells: => DataFrame): (String, String) =
    if (new java.io.File(s"$path/meta").exists()) {
      val r = spark.read.parquet(s"$path/meta").collect().head
      (r.getString(0), r.getString(1))
    } else { val c = cells; (c.columns(0), c.columns(1)) }

  /** Cells with `_gen` guaranteed present: a pre-append index has no
    * `_gen` column — its rows are all build-generation 0 by definition. */
  private def cellsWithGen(cells: DataFrame): DataFrame =
    if (cells.columns.contains("_gen")) cells
    else cells.withColumn("_gen", lit(0L))

  /** Crash-window resolution for [[rebuild]]'s two-rename swap — READ-ONLY
    * (round 12; it used to rename `.old` back into place ambiently): a JVM
    * death between move-out and move-in leaves NOTHING at `path`, with the
    * previous index intact at `path.old`. Every entry point resolves
    * through this and simply SERVES `.old` in place. Renaming from here
    * was a reader-becomes-mutator bug: a search racing a live rebuild's
    * move-out→move-in window saw the same state as a crash, yanked `.old`
    * back under `path`, made the rebuild's move-in fail, and discarded a
    * completed rebuild — and two concurrent readers could race each
    * other's rename, the loser resolving to a now-nonexistent `.old`.
    * Repair is explicit — [[recover]] — never a side effect of a read.
    * No-op (one exists probe) on a healthy index. */
  private def resolveRoot(path: String): String = {
    if (new java.io.File(path).exists()) path
    else {
      val old = new java.io.File(s"$path.old")
      if (old.exists()) old.getPath else path
    }
  }

  /** Explicit crash repair for [[rebuild]]'s swap window — the ONLY place
    * the layout is renamed outside a rebuild's own critical section
    * (readers resolve through [[resolveRoot]] and serve `.old` without
    * touching the filesystem). Must not run concurrently with a rebuild
    * of the same index — it is an operator/maintenance entry point, not
    * part of the read path. Policy, newest-data-first:
    *
    *  - `path` present → "healthy"; stale `.old` / `.rebuilding` leftovers
    *    (a crash after move-in, or before move-out) are swept;
    *  - `path` missing, completed rebuild at `path.rebuilding` (both
    *    parquet `_SUCCESS` markers present — move-out only ever happens
    *    after [[build]] returns, so a mid-swap crash always leaves it
    *    complete) → roll FORWARD: rename it in, drop `.old`;
    *  - otherwise `.old` present → roll BACK the previous index.
    *
    * Returns the action taken ("healthy" | "rolled-forward" |
    * "rolled-back"); throws when there is nothing to recover from. */
  def recover(path: String): String = {
    val dir = new java.io.File(path)
    val old = new java.io.File(s"$path.old")
    val tmp = new java.io.File(s"$path.rebuilding")
    def complete(d: java.io.File): Boolean =
      new java.io.File(d, "centroids/_SUCCESS").exists() &&
        new java.io.File(d, "cells/_SUCCESS").exists()
    if (dir.exists()) {
      graft.util.Fs.deleteRecursively(old)
      graft.util.Fs.deleteRecursively(tmp)
      "healthy"
    } else if (complete(tmp)) {
      require(tmp.renameTo(dir), s"recover: move-in of ${tmp.getPath} failed")
      graft.util.Fs.deleteRecursively(old)
      "rolled-forward"
    } else if (old.exists()) {
      require(old.renameTo(dir), s"recover: rollback of ${old.getPath} failed")
      graft.util.Fs.deleteRecursively(tmp)
      "rolled-back"
    } else throw new IllegalStateException(s"nothing to recover at $path")
  }

  /** Incremental append — the index-maintenance half of build-once/search-
    * many: new vectors are assigned to the EXISTING cells with the frozen
    * quantizer (map-only; centroids ride as plan literals, exactly the
    * build's assignment rule) and appended to the cell-partitioned layout.
    * No retrain, no re-assignment of the base — the whole point is that a
    * nightly batch costs O(batch), not O(index) (the semDedupAutoIncremental
    * pattern: the base never reshuffles against itself). Parquet append
    * into partitioned directories only touches the cells the batch lands
    * in. Search sees appended rows with zero further work.
    *
    * The trade-off appending defers is quantizer STALENESS: cells are
    * optimal for the build distribution, and a drifted batch degrades
    * probe recall silently — [[staleness]] is the paired metric that makes
    * the rebuild decision measurable instead of scheduled. */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             spark: SparkSession, rawPath: String, gen: Long = 1L): Long = {
    require(gen > 0, s"append generations start at 1 (build is 0), got $gen")
    val path = resolveRoot(rawPath)
    val cents = loadCentroids(spark, path)
    require(cents.nonEmpty, s"no centroids at $path")
    // write under the INDEX's column names (meta), not the batch's — a
    // batch arriving as (uid, emb) must not fork the cells schema.
    // `lazy`: a modern (meta-carrying) index never evaluates it, so the
    // O(index) file-listing + footer read stays off the O(batch) append.
    lazy val baseCells = spark.read.parquet(s"$path/cells")
    // Legacy guard: appending `_gen`-stamped files into a cells tree whose
    // base files lack the column makes the merged read schema
    // footer-order-dependent — `_gen` either vanishes (appends silently
    // read as generation 0) or nulls for base rows, corrupting staleness
    // generation attribution. `_gen` (round 9) predates the meta table
    // (round 10), so a pre-`_gen` index is necessarily pre-meta and this
    // probe rides the schema read the meta fallback pays anyway; a
    // meta-carrying index was written by a build that also stamped `_gen`.
    val metaExists = new java.io.File(s"$path/meta").exists()
    if (!metaExists && !baseCells.columns.contains("_gen"))
      throw new IllegalStateException(
        s"index at $path predates generation stamping (no _gen column in " +
          "cells) — run IvfIndex.rebuild first, then append")
    val (baseId, baseVec) = loadMeta(spark, path, baseCells)
    val assigned = batch
      .withColumn("_cell", Ann.nearestCellInt(Ann.quantize3(col(vecCol)), cents))
      .select(col(idCol).as(baseId), col(vecCol).as(baseVec),
        lit(gen).as("_gen"), col("_cell"))
    // count on the write job itself (CollectMetrics): a trailing
    // batch.count() would re-execute the batch plan as a second full scan —
    // doubling the advertised O(batch) cost — and could disagree with what
    // was written if the source changed between the two jobs
    val obs = org.apache.spark.sql.Observation()
    assigned.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("append").partitionBy("_cell").parquet(s"$path/cells")
    obs.get("n").asInstanceOf[Long]
  }

  /** Staleness report: per cell, the population and the mean quantization
    * error of the BUILD generation vs the APPENDED generations — the
    * measurable rebuild signal (`q_embed_drift`'s posture, specialized to
    * the quantizer): appended vectors landing systematically farther from
    * their centroids than the build population means the frozen cells no
    * longer fit the data and probe recall is decaying.
    *
    * Exactness contract: the per-vector squared distance is the build's
    * own integer arithmetic (10⁻³-grid vector vs 10⁻⁶-grid centroid —
    * exact), divided ONCE by 64·10⁶ into a unit-scale double (per-dim
    * mean squared error in original units); only the final per-cell mean
    * is float summation (rounded 6 dp — the registry's cross-engine
    * convention). One map-only projection + one map-side-combinable
    * aggregate; centroids are plan literals, nothing shuffles but the
    * k·gens aggregate rows. */
  def staleness(spark: SparkSession, rawPath: String): DataFrame = {
    val path = resolveRoot(rawPath)
    val cents = loadCentroids(spark, path)
    require(cents.nonEmpty, s"no centroids at $path")
    val cells = cellsWithGen(spark.read.parquet(s"$path/cells"))
    val vecCol = loadMeta(spark, path, cells)._2
    val dims = cents.head._2.length
    // the stored _cell is trusted (it IS the assignment); the distance is
    // recomputed from the struct-array min — bit-identical to assignment,
    // so (min.cell == _cell) also rides as a free integrity check
    val best = array_min(Ann.cellScores(Ann.quantize3(col(vecCol)), cents))
    cells
      .withColumn("_qerr",
        best.getField("d").cast("double") / lit(dims * 1000000.0))
      .withColumn("_isBase", (col("_gen") === 0L).cast("int"))
      .groupBy(col("_cell").as("cell"))
      .agg(
        sum(col("_isBase")).cast("long").as("n_base"),
        sum(lit(1) - col("_isBase")).cast("long").as("n_new"),
        round(avg(when(col("_gen") === 0L, col("_qerr"))), 6).as("qerr_base"),
        round(avg(when(col("_gen") > 0L, col("_qerr"))), 6).as("qerr_new"))
      .orderBy("cell")
  }

  /** Corpus-wide staleness summary: population-weighted mean quantization
    * error of the APPENDED generations over the BUILD generation's — the
    * single scalar the rebuild policy thresholds. None when nothing has
    * been appended (or the base is empty): a fresh index is never stale.
    * Cost: the [[staleness]] aggregate (one map pass + k·gens rows). */
  def stalenessRatio(spark: SparkSession, path: String): Option[Double] = {
    val rep = staleness(spark, path)
    val row = rep.agg(
      (sum(col("qerr_base") * col("n_base")) / sum(col("n_base")))
        .as("base"),
      (sum(col("qerr_new") * col("n_new")) /
        when(sum(col("n_new")) > 0, sum(col("n_new")))).as("nw"))
      .collect().head
    if (row.isNullAt(0) || row.isNullAt(1) || row.getDouble(0) <= 0.0) None
    else Some(row.getDouble(1) / row.getDouble(0))
  }

  /** Retrain the quantizer on the index's CURRENT contents (build + every
    * appended generation) and atomically replace the layout with a fresh
    * generation-0 index — the O(index) operation [[append]] exists to
    * amortize, run only when [[stalenessRatio]] says the frozen cells no
    * longer fit the data. The new index is built into a sibling temp dir
    * and swapped in with two directory renames (local-FS probe/test
    * posture; on an object store the swap is the same pattern over a
    * versioned prefix + pointer flip), so a concurrent reader never sees
    * a half-written layout. Returns the new cell count. */
  def rebuild(spark: SparkSession, rawPath: String,
              centers: Int = 8, iters: Int = 2): Int = {
    val path = resolveRoot(rawPath)
    val cells = spark.read.parquet(s"$path/cells")
    val (idCol, vecCol) = loadMeta(spark, path, cells)
    val corpus = cells.select(col(idCol), col(vecCol))
    val tmp = new java.io.File(s"$path.rebuilding")
    val old = new java.io.File(s"$path.old")
    graft.util.Fs.deleteRecursively(tmp)
    graft.util.Fs.deleteRecursively(old)
    // build reads lazily from `path` while writing `tmp` — distinct dirs,
    // so no self-overwrite; the swap below is rename-only
    val k = build(corpus, idCol, vecCol, tmp.getPath, centers, iters)
    val dir = new java.io.File(path)
    require(dir.renameTo(old), s"index swap failed at $path (move-out)")
    if (!tmp.renameTo(dir)) {
      // roll the live index back before failing — without this, a failed
      // second rename would leave `path` empty and the only copy at .old
      val restored = old.renameTo(dir)
      throw new IllegalStateException(
        s"index swap failed at $path (move-in); previous index " +
          (if (restored) "restored" else s"left at ${old.getPath}"))
    }
    // `.old` is RETAINED after a successful swap (round 13): a concurrent
    // search that resolved through resolveRoot during the move-out→move-in
    // window holds the `.old` path and reads its parquet LAZILY — deleting
    // it here (as this method did through round 12) made that reader fail
    // mid-job on a vanished directory, contradicting resolveRoot's
    // "readers simply serve .old" contract. The stale copy is swept by the
    // NEXT rebuild's own pre-clean above, or by an explicit recover() —
    // both maintenance entry points, never a read or this swap's tail.
    k
  }

  /** The staleness→rebuild loop closure (round-10 verdict item 6): rebuild
    * iff appended vectors quantize ≥ `ratioThreshold`× worse than the
    * build population did. Returns Some(newCellCount) when a rebuild
    * fired, None when the index is healthy — callers schedule this after
    * append batches; the decision is measured, never calendar-based. */
  def rebuildIfStale(spark: SparkSession, path: String,
                     ratioThreshold: Double = 2.0,
                     centers: Int = 8, iters: Int = 2): Option[Int] =
    stalenessRatio(spark, path).filter(_ >= ratioThreshold)
      .map(_ => rebuild(spark, path, centers, iters))

  /** The persisted centroid table as the driver-side Seq the search and
    * any re-assignment path consume — k·dims longs, never corpus-sized. */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Int, Array[Long])] =
    spark.read.parquet(s"${resolveRoot(path)}/centroids")
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
             spark: SparkSession, rawPath: String,
             k: Int, nprobe: Int = 2): DataFrame = {
    val path = resolveRoot(rawPath)
    val cents = loadCentroids(spark, path)
    require(cents.nonEmpty, s"no centroids at $path")
    val cells = spark.read.parquet(s"$path/cells")
    val (idCol, vecCol) = loadMeta(spark, path, cells)
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
