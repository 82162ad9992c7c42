package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.op.{HttpTransport, LogSink}

/** OpenTelemetry-shaped telemetry (docs/telemetry.md) without binding a
  * vendor SDK:
  *
  *  - `OtlpLogSink` renders each engine-logger entry as an OTLP/HTTP
  *    `/v1/logs` export request (resourceLogs → scopeLogs → logRecords,
  *    the JSON encoding of the public OTLP protobuf) and posts it through
  *    the SAME pluggable HttpTransport `$http` uses. Activated by the
  *    `otlp.http` config entry, tee'd with the default SLF4J sink.
  *  - `eventTraces` builds the reference's flat event-trace messages
  *    (docs/telemetry.md:46-67): one JSON message per input message that
  *    carries a UUID `_corr`, emitted onto the `tracesTopic` config
  *    topic. Spans are flat — the trace id IS `_corr` (dashes removed by
  *    the downstream trace-assembly app, not here), and `timestampNanos`
  *    records the moment. A pure columnar projection: no state, no
  *    shuffle, scale-free.
  */
object Telemetry {

  /** Both sinks see every entry (SLF4J default + OTLP export). */
  def tee(a: LogSink, b: LogSink): LogSink = new LogSink {
    def apply(logger: String, level: String, message: String,
        traceId: String, spanId: String, attributesJson: String): Unit = {
      a(logger, level, message, traceId, spanId, attributesJson)
      b(logger, level, message, traceId, spanId, attributesJson)
    }
  }

  /** OTLP severityNumber brackets for the java-ish level names the
    * engine uses (SEVERE..FINEST plus the SLF4J ladder).
    */
  private[streaming] def severity(level: String): (Int, String) =
    Option(level).map(_.toUpperCase).getOrElse("INFO") match {
      case "SEVERE" | "ERROR"           => (17, "ERROR")
      case "WARNING" | "WARN"           => (13, "WARN")
      case "CONFIG" | "FINE" | "DEBUG"  => (5, "DEBUG")
      case "FINER" | "FINEST" | "TRACE" => (1, "TRACE")
      case _                            => (9, "INFO")
    }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** One OTLP/HTTP JSON logs export request per entry. Executors post
    * directly (the transport is serializable, like `$http`): logs are a
    * side effect exactly where they happen, no driver funnel.
    */
  final class OtlpLogSink(endpoint: String, serviceName: String,
      http: HttpTransport) extends LogSink {
    def apply(logger: String, level: String, message: String,
        traceId: String, spanId: String, attributesJson: String): Unit = {
      val (num, text) = severity(level)
      val attrs =
        Option(attributesJson).map(a =>
          s""",{"key":"attributes","value":{"stringValue":${jstr(a)}}}""")
          .getOrElse("")
      val trace = Option(traceId)
        .map(t => s""","traceId":${jstr(t)},"spanId":${jstr(
            Option(spanId).getOrElse(t.substring(0, t.length / 2)))}""")
        .getOrElse("")
      val body =
        s"""{"resourceLogs":[{"resource":{"attributes":[
           |{"key":"service.name","value":{"stringValue":${jstr(serviceName)}}}]},
           |"scopeLogs":[{"scope":{"name":${jstr(logger)}},
           |"logRecords":[{"timeUnixNano":"${System.currentTimeMillis() * 1000000L}",
           |"severityNumber":$num,"severityText":${jstr(text)},
           |"body":{"stringValue":${jstr(message)}},
           |"attributes":[{"key":"logger","value":{"stringValue":${jstr(logger)}}}$attrs]
           |$trace}]}]}]}""".stripMargin.replace("\n", "")
      http("POST", endpoint.stripSuffix("/") + "/v1/logs",
        """{"Content-Type":"application/json"}""", body)
    }
  }

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** A message field, whatever the frame shape: JSON extraction on
    * schemaless (key, value) frames, the typed column when declared,
    * null otherwise.
    */
  private def field(df: DataFrame, typed: String, jsonPath: String): Column =
    if (df.columns.contains("value") &&
      df.schema("value").dataType == StringType &&
      !df.columns.contains(typed.split("\\.").head))
      get_json_object(col("value"), jsonPath)
    else if (df.columns.contains(typed.split("\\.").head))
      col(typed).cast(StringType)
    else lit(null).cast(StringType)

  /** Event-trace messages for every input message with a UUID `_corr`
    * (docs/telemetry.md:46-67). `sub` is the subpart name (`<part>.in`,
    * `<part>.out`, `<part>.merged`, ...).
    */
  def eventTraces(df: DataFrame, application: String, part: String,
      sub: String, namespace: String, version: String): DataFrame = {
    val corr = field(df, "_corr", "$._corr")
    val user = field(df, "_jwt.sub", "$._jwt.sub")
    df.where(corr.rlike(UuidRe))
      .select(lit(null).cast(StringType).as("key"),
        to_json(struct(
          struct(
            lit(application).as("application"),
            lit(part).as("part"),
            lit("json-streams").as("profile.frame.type"),
            lit(version).as("profile.frame.version")).as("attributes"),
          lit(sub).as("name"),
          lit(namespace).as("serviceNamespace"),
          lit(application).as("serviceName"),
          lit(version).as("serviceVersion"),
          (unix_micros(current_timestamp()) * 1000).as("timestampNanos"),
          corr.as("traceId"),
          user.as("username"))).as("value"))
  }
}
