package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run the STAGED curation DAG (Curation.stagedPipeline) with
  * per-stage row counts and wall times — the sandbox analog of the
  * 100 TB operating mode (stage artifacts persisted, each stage re-read
  * from parquet). Prints one JSON line per stage plus the final report,
  * for SCALE.md's write-amplification table.
  * Usage: {{{ runMain graft.tools.CurationProbe /root/testdata/sf0.1 }}} */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsIn = graft.Tables.documents(spark, dir).count()
    val root = graft.Queries.scratchDir("probe_curation")
    val t0 = System.nanoTime()
    val res = graft.text.Curation.stagedPipeline(spark, dir, root,
      countRows = true)
    val reportRows = res.report.collect()
    val total = (System.nanoTime() - t0) / 1e9

    def sizeOf(path: String): Long = {
      val d = new java.io.File(path)
      if (!d.exists()) 0L
      else d.listFiles().filter(_.isFile).map(_.length()).sum
    }
    println(f"""{"op":"curation_input","dir":"$dir","rows":$docsIn}""")
    res.stages.foreach { st =>
      println(f"""{"op":"curation_stage","name":"${st.name}","rows_out":${st.rowsOut},"wall_sec":${st.wallSec}%.3f,"bytes":${sizeOf(st.path)}}""")
    }
    println(f"""{"op":"curation_total","wall_sec":$total%.3f,"langs":${reportRows.length}}""")
    reportRows.foreach(r => println(s"""{"op":"curation_report","lang":"${r.getString(0)}","n_chunks":${r.getLong(1)},"sum_tokens":${r.getLong(2)}}"""))
    spark.stop()
  }
}
