package graft.config

import java.time.LocalDateTime
import scala.jdk.CollectionConverters._

/** YAML config model mirroring the reference's single config file
  * (`/root/reference/config.yaml`): queries map (ORDERED — column order is
  * the positional feature contract, `realtime_detector.py:44`), data /
  * preprocessing / filtering / training / realtime sections, with the same
  * key names and defaulting rules. Pure Scala + snakeyaml (ships with
  * Spark); no Spark dependency.
  */
final case class Period(start: LocalDateTime, end: LocalDateTime) {
  def valid: Boolean = start.isBefore(end) // P7 period validation
}

final case class DataSettings(
    collectionPeriodHours: Int,
    collectionPeriodsIso: Seq[Period],
    startTimeIso: Option[LocalDateTime],
    endTimeIso: Option[LocalDateTime],
    cacheChunkHours: Int,
    stepSeconds: Long,
    outputFilename: String) {

  /** The reference's period-resolution ladder
    * (`data_collector.py:172-213`): explicit multi-period list wins; else
    * the legacy single-window fallbacks — start/end ISO pair when
    * `collection_period_hours` is 0/absent, otherwise
    * `collection_period_hours` back from `now`. */
  def effectivePeriods(now: LocalDateTime): Seq[Period] =
    if (collectionPeriodsIso.nonEmpty) collectionPeriodsIso
    else (startTimeIso, endTimeIso) match {
      case (Some(s), Some(e)) if collectionPeriodHours <= 0 =>
        Seq(Period(s, e)).filter(_.valid)
      case _ if collectionPeriodHours > 0 =>
        Seq(Period(now.minusHours(collectionPeriodHours.toLong), now))
      case _ => Nil
    }
}

final case class PreprocessingSettings(
    nanFillStrategy: String,
    scalerType: String,
    processedOutputFilename: String,
    scalerOutputFilename: String)

final case class TrainingSettings(
    modelOutputFilename: String,
    sequenceLength: Int,
    trainSplitRatio: Double,
    epochs: Int,
    batchSize: Int,
    learningRate: Double,
    earlyStoppingPatience: Int,
    lstmUnits: Seq[Int]) // enc1, enc2/latent, dec1, dec2

final case class RealtimeSettings(
    queryIntervalSeconds: Int,
    anomalyThresholdMse: Double,
    exporterPort: Int,
    metricsPrefix: String)

final case class GraftConfig(
    prometheusUrl: String,
    artifactsDir: String,
    queries: Seq[(String, String)], // ordered (alias, promql)
    data: DataSettings,
    preprocessing: PreprocessingSettings,
    training: TrainingSettings,
    realtime: RealtimeSettings) {
  /** The positional feature contract: query aliases + calendar columns
    * (`realtime_detector.py:44`, `data_collector.py:226-227`). */
  def featureColumns: Seq[String] =
    queries.map(_._1) ++ Seq("day_of_week", "hour_of_day")
}

object GraftConfig {

  /** F2: duration string → seconds: "30s" / "2m" / "1h" / bare int
    * (`realtime_detector.py:128-140`). */
  def parseDurationSeconds(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "empty duration")
    t.last match {
      case 's' | 'S' => t.dropRight(1).trim.toLong
      case 'm' | 'M' => t.dropRight(1).trim.toLong * 60
      case 'h' | 'H' => t.dropRight(1).trim.toLong * 3600
      case 'd' | 'D' => t.dropRight(1).trim.toLong * 86400
      case _         => t.toLong // bare-int fallback
    }
  }

  /** F1: ISO-8601 local datetime parse (`data_collector.py:176-177`). */
  def parseIso(s: String): LocalDateTime = LocalDateTime.parse(s.trim)

  def fromYaml(yamlText: String): GraftConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](yamlText)
    fromMap(Option(root).getOrElse(new java.util.LinkedHashMap()))
  }

  def loadFile(path: String): GraftConfig =
    fromYaml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  private def fromMap(root: java.util.Map[String, Object]): GraftConfig = {
    def section(name: String): Map[String, Object] =
      Option(root.get(name)) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
        case _ => Map.empty
      }
    def str(m: Map[String, Object], k: String, dflt: String): String =
      m.get(k).map(_.toString).getOrElse(dflt)
    def int(m: Map[String, Object], k: String, dflt: Int): Int =
      m.get(k).map(_.toString.toDouble.toInt).getOrElse(dflt)
    def dbl(m: Map[String, Object], k: String, dflt: Double): Double =
      m.get(k).map(_.toString.toDouble).getOrElse(dflt)

    // snakeyaml preserves YAML mapping order via LinkedHashMap — the ordered
    // queries contract survives the parse.
    val queries: Seq[(String, String)] = Option(root.get("queries")) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.toSeq.map { case (k, v) => k.toString -> v.toString }
      case _ => Nil
    }

    val ds = section("data_settings")
    val periods: Seq[Period] = ds.get("collection_periods_iso") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
          val mm = m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
          Period(parseIso(mm("start")), parseIso(mm("end")))
        }.filter(_.valid) // P7: invalid periods dropped (data_collector.py:178-180)
      case _ => Nil
    }
    val pp = section("preprocessing_settings")
    val tr = section("training_settings")
    val rt = section("real_time_anomaly_detection")

    GraftConfig(
      prometheusUrl = str(root.asScala.toMap.map { case (k, v) => k -> v },
        "prometheus_url", "http://localhost:9090"),
      artifactsDir = Option(root.get("artifacts_dir")).map(_.toString)
        .getOrElse("artifacts"),
      queries = queries,
      data = DataSettings(
        collectionPeriodHours = int(ds, "collection_period_hours", 0),
        collectionPeriodsIso = periods,
        startTimeIso = ds.get("start_time_iso").map(v => parseIso(v.toString)),
        endTimeIso = ds.get("end_time_iso").map(v => parseIso(v.toString)),
        cacheChunkHours = int(ds, "cache_chunk_hours", 1),
        stepSeconds = ds.get("step").map(v => parseDurationSeconds(v.toString))
          .getOrElse(120L),
        outputFilename = str(ds, "output_filename", "prometheus_metrics_data.parquet")),
      preprocessing = PreprocessingSettings(
        nanFillStrategy = str(pp, "nan_fill_strategy", "ffill_then_bfill"),
        scalerType = str(pp, "scaler_type", "MinMaxScaler"),
        processedOutputFilename =
          str(pp, "processed_output_filename", "processed_metrics_data.parquet"),
        scalerOutputFilename = str(pp, "scaler_output_filename", "fitted_scaler.json")),
      training = TrainingSettings(
        modelOutputFilename = str(tr, "model_output_filename", "lstm_autoencoder.json"),
        sequenceLength = int(tr, "sequence_length", 20),
        trainSplitRatio = dbl(tr, "train_split_ratio", 0.8),
        epochs = int(tr, "epochs", 50),
        batchSize = int(tr, "batch_size", 64),
        learningRate = dbl(tr, "learning_rate", 0.001),
        earlyStoppingPatience = int(tr, "early_stopping_patience", 10),
        lstmUnits = Seq(
          int(tr, "lstm_units_encoder1", 64),
          int(tr, "lstm_units_encoder2_latent", 32),
          int(tr, "lstm_units_decoder1", 32),
          int(tr, "lstm_units_decoder2", 64))),
      realtime = RealtimeSettings(
        queryIntervalSeconds = int(rt, "query_interval_seconds", 30),
        anomalyThresholdMse = dbl(rt, "anomaly_threshold_mse", 0.0025),
        exporterPort = int(rt, "exporter_port", 8901),
        metricsPrefix = str(rt, "metrics_prefix", "anomaly_detector_")))
  }
}
