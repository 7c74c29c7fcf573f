package graft

import org.apache.spark.sql.SparkSession

/** Subcommand dispatcher mirroring the reference CLI surface
  * (`/root/reference/cli.py:7-36`): collect | preprocess | train | filter |
  * detect, all driven by one YAML config. A user of the reference runs the
  * same stage names against the same config keys.
  *
  *   sbt "runMain graft.Cli <stage> <config.yaml> [--distributed]"
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.Cli <collect|preprocess|train|filter|detect|all> <config.yaml> [--distributed]")
      sys.exit(2)
    }
    val stage = args(0)
    val cfg = config.GraftConfig.loadFile(args(1))
    val distributed = args.contains("--distributed")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$stage")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      stage match {
        case "collect" =>
          val wide = Stages.collect(spark, cfg)
          println(s"collected ${wide.count()} rows x ${wide.columns.length} cols")
        case "preprocess" =>
          println(s"preprocessed ${Stages.preprocess(spark, cfg).count()} rows")
        case "train" =>
          val r = Stages.train(spark, cfg, distributed)
          println(f"trained ${r.history.size} epochs; best epoch ${r.bestEpoch}; " +
            f"final loss ${r.history.last._1}%.6f")
        case "filter" =>
          val scored = Stages.filterAnomalies(spark, cfg)
          val anomalies = scored.filter(org.apache.spark.sql.functions
            .col("is_anomaly")).count()
          println(s"scored ${scored.count()} windows; $anomalies anomalous")
        case "detect" =>
          val exporter = new realtime.Exporter(cfg.realtime.metricsPrefix)
          val scaler = scala.util.Try(operators.Scalers.load(
            s"${cfg.artifactsDir}/${cfg.preprocessing.scalerOutputFilename}")).toOption
          val model = scala.util.Try(model_load(cfg)).toOption
          val det = new realtime.Detector(spark, cfg, exporter, scaler, model,
            realtime.Detector.prometheusFetch(spark, cfg))
          val port = exporter.start(cfg.realtime.exporterPort)
          println(s"exporter on :$port; polling every " +
            s"${cfg.realtime.queryIntervalSeconds}s — Ctrl-C to stop")
          det.runLoop()
        case "all" =>
          Stages.collect(spark, cfg)
          Stages.preprocess(spark, cfg)
          Stages.train(spark, cfg, distributed)
          Stages.filterAnomalies(spark, cfg)
          println("all batch stages complete")
        case other =>
          System.err.println(s"unknown stage '$other'"); sys.exit(2)
      }
    } finally spark.stop()
  }

  private def model_load(cfg: config.GraftConfig) =
    model.Lstm.load(s"${cfg.artifactsDir}/${cfg.training.modelOutputFilename}")
}
