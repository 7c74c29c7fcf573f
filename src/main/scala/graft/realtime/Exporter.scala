package graft.realtime

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** S10: Prometheus exporter sink — an HTTP `/metrics` endpoint serving the
  * text exposition format, with the reference's six series
  * (`/root/reference/realtime_detector.py:249-258`, prefix
  * `config.yaml:126`). Gauge state is a ConcurrentHashMap updated by the
  * detection loop; the server is `com.sun.net.httpserver` (JDK built-in).
  */
final class Exporter(prefix: String = "anomaly_detector_") {

  private val gauges = new ConcurrentHashMap[String, Double]()
  private val counters = new ConcurrentHashMap[String, Double]()
  // (metric, feature_name) -> value for the labeled per-feature series
  private val featureGauges = new ConcurrentHashMap[(String, String), Double]()
  @volatile private var server: Option[com.sun.net.httpserver.HttpServer] = None

  // The six reference series (FIXTURES.md §6).
  val LatestMse = "latest_reconstruction_error_mse"
  val IsAnomaly = "is_anomaly_detected"
  val TotalAnomalies = "total_anomalies_count_total"
  val FeatureMse = "feature_reconstruction_error_mse"
  val LastSuccess = "last_successful_run_timestamp_seconds"
  val WindowPoints = "data_points_in_current_window"
  // Fetch-health series (round-9, beyond the reference's six): per-query
  // cumulative retry / exhausted-fetch counts from PromIngest.FetchStats.
  val FetchRetries = "fetch_retries"
  val FetchFailures = "fetch_failures"

  def setGauge(name: String, v: Double): Unit = gauges.put(name, v)
  def incCounter(name: String, by: Double = 1.0): Unit =
    counters.merge(name, by, (a, b) => a + b)
  def counterValue(name: String): Double = counters.getOrDefault(name, 0.0)
  def setFeatureGauge(name: String, feature: String, v: Double): Unit =
    featureGauges.put((name, feature), v)

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  /** Label-value escaping per the exposition format spec: backslash,
    * double-quote and newline must be escaped inside label values. */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Render the Prometheus text exposition format (public format spec). */
  def render(): String = {
    val sb = new StringBuilder
    gauges.asScala.toSeq.sortBy(_._1).foreach { case (n, v) =>
      sb.append(s"# TYPE $prefix$n gauge\n")
      sb.append(s"$prefix$n ${fmt(v)}\n")
    }
    featureGauges.asScala.toSeq.sortBy(_._1).groupBy(_._1._1).toSeq.sortBy(_._1)
      .foreach { case (n, entries) =>
        sb.append(s"# TYPE $prefix$n gauge\n")
        entries.sortBy(_._1._2).foreach { case ((_, f), v) =>
          sb.append(s"""$prefix$n{feature_name="${esc(f)}"} ${fmt(v)}""").append('\n')
        }
      }
    counters.asScala.toSeq.sortBy(_._1).foreach { case (n, v) =>
      sb.append(s"# TYPE $prefix$n counter\n")
      sb.append(s"$prefix$n ${fmt(v)}\n")
    }
    sb.toString
  }

  /** Start the HTTP server on `port` (0 = ephemeral); returns bound port. */
  def start(port: Int): Int = synchronized {
    require(server.isEmpty, "exporter already started")
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    s.createContext("/metrics", (exchange: com.sun.net.httpserver.HttpExchange) => {
      val body = render().getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type",
        "text/plain; version=0.0.4; charset=utf-8")
      exchange.sendResponseHeaders(200, body.length)
      val os = exchange.getResponseBody
      os.write(body); os.close()
    })
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }
}
