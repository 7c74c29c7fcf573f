package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Media feature index — decode ONCE, reuse everywhere (the
  * [[graft.sim.IvfIndex]] build/append/search split, applied to the
  * multimodal family). Rationale: every fingerprint/pair/feature query
  * used to pay its own full decode of the SAME payloads — at the 100×
  * scale record the media family's re-decoding was the single largest
  * cost block (~260 s of the sf10 wall, one full corpus decode per
  * query). A production pipeline never does that: payload bytes are
  * decoded once per ingest generation into a persisted
  * fingerprint+feature table, and every downstream read — near-dup
  * banding, Hamming pairs, feature joins — consumes the table.
  *
  *  - [[build]]: ONE [[Multimodal.indexRow]] pass over the assets (each
  *    payload decoded at most once — dhash, ahash, vhash AND the feature
  *    vector all derive from that single decode), written as parquet
  *    PARTITIONED BY MODALITY (a per-modality read — image pairs, audio
  *    pairs — prunes to its own directory), rows stamped `_gen = 0`.
  *  - [[append]]: new assets decode through the same kernel and append
  *    as a later generation — O(batch), the base never re-decodes (the
  *    IvfIndex.append contract; IndexProbe-style evidence in SCALE.md).
  *  - [[hashes]]/[[features]]/[[load]]: the read paths. Hash/feature
  *    values round-trip parquet exactly (int64 / float32), so reading
  *    the index is bit-identical to re-running the decoder — the oracle
  *    rows (q_mm_index, q_phash, q_ahash, q_vhash, q_mm_features_real)
  *    certify that equality against the DuckDB formula replay every
  *    round.
  *  - [[generations]]: per (modality, generation) population + decode
  *    health — the rebuild/quarantine signal (a generation whose
  *    hash-null ratio jumps means a codec or crawler regression).
  *
  * Scale shape: the build is a map-only pass (zero shuffle — payloads
  * never leave their input partition, only ids+hashes+features are
  * written); reads are pruned parquet scans. At 100 TB the index is the
  * only artifact the pair/search queries touch — corpus bytes are read
  * exactly once per generation. */
object MediaIndex {

  /** On-disk row layout. `modality` is the partition column. */
  val indexSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("dhash", LongType, nullable = true),
    StructField("ahash", LongType, nullable = true),
    StructField("vhash", LongType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true),
    StructField("_gen", LongType, nullable = false),
    StructField("modality", StringType, nullable = true)))

  /** The single-pass decode projection: assets → index rows at `gen`. */
  private def indexFrame(assets: DataFrame, dim: Int, gen: Long): DataFrame = {
    val idIdx = assets.schema.fieldIndex("asset_id")
    val cIdx = assets.schema.fieldIndex("content")
    val mIdx = assets.schema.fieldIndex("modality")
    assets.mapPartitions { it =>
      it.map { r =>
        val modality = r.getAs[String](mIdx)
        val (dh, ah, vh, feats) = Multimodal.indexRow(
          modality, r.getAs[Array[Byte]](cIdx), dim)
        Row(r.getLong(idIdx), dh, ah, vh, feats, gen, modality)
      }
    }(RowEncoder.encoderFor(indexSchema))
  }

  /** Decode every asset once and persist the index at `path` (parquet
    * `hashes/` partitioned by modality + a one-row `meta/` pinning the
    * feature dim). Returns the row count — observed on the write job
    * itself, never a second scan (the IvfIndex.append pattern). */
  def build(assets: DataFrame, path: String, dim: Int = 16): Long = {
    val spark = assets.sparkSession
    import spark.implicits._
    Seq(dim).toDF("dim").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    val obs = org.apache.spark.sql.Observation()
    indexFrame(assets, dim, gen = 0L)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite").partitionBy("modality").parquet(s"$path/hashes")
    obs.get("n").asInstanceOf[Long]
  }

  /** The persisted feature dim — the decode parameter readers and appends
    * must agree on (an append at a different dim would fork the feature
    * space silently). */
  def dimOf(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/meta").collect().head.getInt(0)

  /** Incremental maintenance: decode ONLY the arriving batch (same
    * single-pass kernel, at the INDEX's persisted dim) and append it as
    * generation `gen` — O(batch); the base generations are never read,
    * let alone re-decoded. Parquet append into the modality-partitioned
    * layout touches only the directories the batch lands in. */
  def append(batch: DataFrame, spark: SparkSession, path: String,
             gen: Long = 1L): Long = {
    require(gen > 0, s"append generations start at 1 (build is 0), got $gen")
    val dim = dimOf(spark, path)
    val obs = org.apache.spark.sql.Observation()
    indexFrame(batch, dim, gen)
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("append").partitionBy("modality").parquet(s"$path/hashes")
    obs.get("n").asInstanceOf[Long]
  }

  /** The full index table. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/hashes")

  /** One modality's non-null fingerprints — `(asset_id, <hashCol>)`, the
    * input shape [[graft.sim.Hamming.pairCounts]] consumes. The modality
    * equality prunes to one partition directory; only the two columns are
    * read. */
  def hashes(spark: SparkSession, path: String, modality: String,
             hashCol: String): DataFrame =
    load(spark, path)
      .filter(col("modality") === modality && col(hashCol).isNotNull)
      .select(col("asset_id"), col(hashCol))

  /** All feature vectors — `(asset_id, features)`. */
  def features(spark: SparkSession, path: String): DataFrame =
    load(spark, path).select(col("asset_id"), col("features"))

  /** Per-(modality, generation) population and decode health: `n_hashed`
    * counts rows whose modality fingerprint decoded (non-null) — the
    * quarantine signal. One pruned two-column scan + one map-side
    * combinable aggregate. */
  def generations(spark: SparkSession, path: String): DataFrame =
    load(spark, path)
      .groupBy(col("modality"), col("_gen").as("gen"))
      .agg(count(lit(1)).as("n"),
        sum(when(coalesce(col("dhash"), col("ahash"), col("vhash"))
          .isNotNull, 1L).otherwise(0L)).as("n_hashed"))
      .orderBy("modality", "gen")

  // ---- cross-query (and cross-JVM) cached index over a source dataset ----

  /** Key a cached index on the IDENTITY of its source parquet directory:
    * canonical path + per-file (name, size, mtime). A regenerated corpus
    * changes the key, so a stale cache can never serve (it is simply
    * never found); stale keys are garbage a cache clear sweeps. */
  private def sourceKey(sourceDir: String, dim: Int): String = {
    val dir = new java.io.File(sourceDir, "documents.parquet")
    val canonical = dir.getCanonicalPath
    val stats =
      if (dir.isFile) Seq(s"${dir.getName}:${dir.length}:${dir.lastModified}")
      else Option(dir.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$canonical|$dim|${stats.mkString(",")}".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The cache root: a USER-OWNED directory, not the world-shared
    * `java.io.tmpdir` (round 13) — a predictable /tmp path trusted on a
    * marker file alone let any local user pre-plant a poisoned index that
    * Verify/Bench would then serve. Default `~/.cache/graft_media_index`,
    * created 0700 EXPLICITLY — `File.mkdirs()` honors the process umask
    * (typically 0755), so "the JVM default" the round-13 comment leaned
    * on does not exist (round-14 ADVICE, low); under a permissive umask
    * that would have re-opened the poisoning door the move out of /tmp
    * closed. `GRAFT_MEDIA_CACHE` overrides for tests and for pointing
    * scale runs at a bigger disk. Clearing it is the documented cold-run
    * step (BASELINE.md protocol note). */
  private def cacheRoot(): java.io.File = {
    val dir = sys.env.get("GRAFT_MEDIA_CACHE").map(new java.io.File(_))
      .getOrElse(new java.io.File(
        new java.io.File(sys.props("user.home"), ".cache"),
        "graft_media_index"))
    try {
      java.nio.file.Files.createDirectories(dir.toPath)
      // set AFTER creation, not via createDirectories attrs: attrs apply
      // only to dirs created by THIS call and are still umask-filtered on
      // some filesystems — setPosixFilePermissions is unconditional
      java.nio.file.Files.setPosixFilePermissions(dir.toPath,
        java.nio.file.attribute.PosixFilePermissions.fromString("rwx------"))
    } catch {
      case _: UnsupportedOperationException => () // non-POSIX fs: best effort
      case _: java.io.IOException =>
        // created by a racer is benign, but a FAILED chmod under a
        // permissive umask silently leaves the dir group/world-accessible —
        // verify the actual bits and say so instead of proceeding quietly
        // (round-15 ADVICE, low)
        try {
          import java.nio.file.attribute.PosixFilePermission._
          import scala.jdk.CollectionConverters._
          val owner = Set(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE)
          val perms = java.nio.file.Files
            .getPosixFilePermissions(dir.toPath).asScala.toSet
          if (!perms.subsetOf(owner))
            System.err.println(s"[graft] WARNING: media cache $dir is not " +
              s"owner-only (perms $perms) and chmod failed — another local " +
              "user could read or pre-plant a decoded index; chmod 700 it " +
              "or point GRAFT_MEDIA_CACHE at a private directory")
        } catch { case _: Throwable => () }
    }
    dir
  }

  /** Build-if-absent: the persisted index for `mkAssets` over `sourceDir`,
    * cached under [[cacheRoot]] keyed by [[sourceKey]]. The FIRST
    * consumer in a session (or across sessions — the key survives JVM
    * restarts, which is what lets the per-query forked bench children and
    * the Verify/Bench/test JVMs share one decode) pays the one-pass
    * build; everyone else reads parquet.
    *
    * Cross-process protocol (round 13): installs are serialized by an
    * exclusive `FileLock` on a sibling `<key>.lock` — the round-12
    * unguarded delete-then-rename let two processes that both saw a
    * marker-less root each clear it, one deleting the other's
    * just-renamed COMPLETE index, after which both renames failed and no
    * index was installed at all. Under the lock the sequence is trivially
    * safe: re-check the marker (the winner installed while we waited),
    * sweep a crashed build's marker-less leftover, build into a
    * process-unique temp sibling, one rename. A waiter pays the winner's
    * build as lock-wait instead of a second redundant decode — strictly
    * less total work. Returns the index path. */
  def cachedFor(spark: SparkSession, sourceDir: String, dim: Int = 16)
               (mkAssets: => DataFrame): String = synchronized {
    val root = new java.io.File(cacheRoot(), sourceKey(sourceDir, dim))
    val marker = new java.io.File(root, "hashes/_SUCCESS")
    if (marker.exists()) return root.getPath // fast path: no lock traffic
    root.getParentFile.mkdirs()
    val lockFile = new java.io.File(root.getParentFile, s"${root.getName}.lock")
    val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock() // blocks until the concurrent installer finishes
    try {
      if (marker.exists()) return root.getPath // installed while we waited
      // marker-less root under the lock = a CRASHED build (no live racer
      // can hold one now) — safe to clear before installing fresh
      graft.util.Fs.deleteRecursively(root)
      val tmp = new java.io.File(root.getParentFile,
        s"${root.getName}.tmp.${java.lang.ProcessHandle.current().pid()}")
      graft.util.Fs.deleteRecursively(tmp)
      build(mkAssets, tmp.getPath, dim)
      require(tmp.renameTo(root),
        s"media index install failed at ${root.getPath}")
      root.getPath
    } finally { lock.release(); ch.close() }
  }
}
