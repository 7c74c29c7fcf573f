package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 leg decomposition for q_ann_ivf_append: build (k-means +
  * 3 writes) vs append (1 write) vs staleness (read + agg), plus the
  * produced file counts — guide §6's file-layout audit. */
object IvfLegsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") < 250)
    val batch = emb.filter(col("vec_id") >= 250)
    val path = java.nio.file.Files
      .createTempDirectory("ivf_legs").toString + "/idx"
    def time(label: String)(act: => Unit): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s first ${ts.head}%.3f " +
        f"steady ${ts.drop(1).sorted.apply((reps - 1) / 2)}%.3f")
    }
    time("build") {
      graft.sim.IvfIndex.build(base, "vec_id", "embedding", path,
        centers = 8, iters = 2)
    }
    time("append") {
      graft.sim.IvfIndex.append(batch, "vec_id", "embedding", spark, path)
    }
    time("staleness") {
      graft.sim.IvfIndex.staleness(spark, path)
        .write.format("noop").mode("overwrite").save()
    }
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      .filter(p => p.toString.endsWith(".parquet")).count()
    println(s"parquet files under index: $files")
    spark.stop()
  }
}
