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

  test("legacy period fallbacks follow the reference ladder") {
    import java.time.LocalDateTime
    val now = LocalDateTime.parse("2025-06-10T12:00:00")
    // explicit periods win
    val c1 = GraftConfig.fromYaml(yaml)
    assert(c1.data.effectivePeriods(now) == c1.data.collectionPeriodsIso)
    // ISO pair used when hours = 0
    val c2 = GraftConfig.fromYaml(
      """data_settings:
        |  collection_period_hours: 0
        |  start_time_iso: "2025-05-31T10:00:00"
        |  end_time_iso: "2025-05-31T11:00:00"
        |""".stripMargin)
    val p2 = c2.data.effectivePeriods(now)
    assert(p2.size == 1 && p2.head.start.getHour == 10 && p2.head.end.getHour == 11)
    // hours-back-from-now otherwise
    val c3 = GraftConfig.fromYaml("data_settings:\n  collection_period_hours: 24\n")
    val p3 = c3.data.effectivePeriods(now)
    assert(p3 == Seq(Period(now.minusHours(24), now)))
    // nothing configured -> no periods
    assert(GraftConfig.fromYaml("").data.effectivePeriods(now).isEmpty)
  }

  test("empty yaml yields pure defaults") {
    val c = GraftConfig.fromYaml("")
    assert(c.queries.isEmpty)
    assert(c.data.stepSeconds == 120L)
    assert(c.training.sequenceLength == 20)
    assert(c.realtime.anomalyThresholdMse == 0.0025)
  }
}
