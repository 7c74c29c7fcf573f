package graft.config

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private val yaml =
    """prometheus_url: "http://localhost:9090"
      |artifacts_dir: "out"
      |queries:
      |  cpu_usage: 'rate(cpu_total[1m])'
      |  mem_free: 'mem_free_bytes'
      |  threads: 'system_threads'
      |data_settings:
      |  collection_period_hours: 336
      |  collection_periods_iso:
      |    - start: "2025-05-23T10:00:00"
      |      end: "2025-05-26T00:00:00"
      |    - start: "2025-06-04T04:00:00"
      |      end: "2025-06-01T00:00:00"
      |  cache_chunk_hours: 2
      |  step: "2m"
      |preprocessing_settings:
      |  nan_fill_strategy: "median"
      |  scaler_type: "StandardScaler"
      |training_settings:
      |  sequence_length: 10
      |  train_split_ratio: 0.75
      |  learning_rate: 0.01
      |  lstm_units_encoder1: 16
      |  lstm_units_encoder2_latent: 8
      |  lstm_units_decoder1: 8
      |  lstm_units_decoder2: 16
      |real_time_anomaly_detection:
      |  query_interval_seconds: 15
      |  anomaly_threshold_mse: 0.01
      |  exporter_port: 9999
      |""".stripMargin

  test("queries map preserves YAML order (the positional feature contract)") {
    val c = GraftConfig.fromYaml(yaml)
    assert(c.queries.map(_._1) == Seq("cpu_usage", "mem_free", "threads"))
    assert(c.featureColumns ==
      Seq("cpu_usage", "mem_free", "threads", "day_of_week", "hour_of_day"))
  }

  test("sections parse with reference key names; defaults fill gaps") {
    val c = GraftConfig.fromYaml(yaml)
    assert(c.data.stepSeconds == 120L)
    assert(c.data.cacheChunkHours == 2)
    assert(c.preprocessing.nanFillStrategy == "median")
    assert(c.preprocessing.scalerType == "StandardScaler")
    assert(c.training.sequenceLength == 10)
    assert(c.training.lstmUnits == Seq(16, 8, 8, 16))
    assert(c.training.epochs == 50) // default
    assert(c.realtime.queryIntervalSeconds == 15)
    assert(c.realtime.metricsPrefix == "anomaly_detector_") // default
  }

  test("P7: invalid periods (start >= end) are dropped") {
    val c = GraftConfig.fromYaml(yaml)
    assert(c.data.collectionPeriodsIso.size == 1)
    assert(c.data.collectionPeriodsIso.head.start.getDayOfMonth == 23)
  }

  test("F2: duration parse handles s/m/h/d and bare-int fallback") {
    assert(GraftConfig.parseDurationSeconds("30s") == 30L)
    assert(GraftConfig.parseDurationSeconds("2m") == 120L)
    assert(GraftConfig.parseDurationSeconds("1h") == 3600L)
    assert(GraftConfig.parseDurationSeconds("1d") == 86400L)
    assert(GraftConfig.parseDurationSeconds("120") == 120L)
    intercept[Exception] { GraftConfig.parseDurationSeconds("abc") }
  }

  test("empty yaml yields pure defaults") {
    val c = GraftConfig.fromYaml("")
    assert(c.queries.isEmpty)
    assert(c.data.stepSeconds == 120L)
    assert(c.training.sequenceLength == 20)
    assert(c.realtime.anomalyThresholdMse == 0.0025)
  }
}
