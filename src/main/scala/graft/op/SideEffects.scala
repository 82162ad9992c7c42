package graft.op

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.json.Js

/** Pluggable transports for the side-effecting stages. Tests inject
  * deterministic fakes; production wires real HTTP/S3 clients. Both must be
  * Serializable — they execute on executors inside codegen'd projections.
  */
final case class HttpResult(status: Int, body: String)

trait HttpTransport extends Serializable {
  def apply(method: String, url: String, headersJson: String,
      body: String): HttpResult
}

trait ObjectStore extends Serializable {
  def get(bucket: String, key: String): String
  def put(bucket: String, key: String, content: String): Unit
}

/** `$http` (docs/aggregation_stages.md:207-244): per-message HTTP call;
  * url/method/headers/body are expressions; 2xx responses land in `as`,
  * errors in `httpError {statusCode, body}`; `unwind` explodes JSON-array
  * responses. The response body stays a JSON string column (the reference
  * is schemaless; downstream stages can `$stringToJson` it).
  */
object Http {

  final case class ErrorRow(statusCode: Int, body: String)
  final case class CallRow(response: Option[String], httpError: Option[ErrorRow])

  def apply(df: DataFrame, spec: JsonNode, env: Env): DataFrame = {
    val ctx = Stages.ctxOf(df)
    def exprStr(name: String): Column =
      if (spec.has(name)) {
        val c = Stages.expr(df, spec.get(name))
        ctx.typeOf(c) match {
          case _: StructType | _: ArrayType | _: MapType => to_json(c)
          case _                                         => c.cast(StringType)
        }
      } else lit(null).cast(StringType)

    val transport = env.http
    val call = udf((m: String, u: String, h: String, b: String) => {
      val r = transport(m, u, h, b)
      if (r.status >= 200 && r.status < 300) CallRow(Some(r.body), None)
      else CallRow(None, Some(ErrorRow(r.status, r.body)))
    })

    val withCall = df.withColumn("__http",
      call(exprStr("method"), exprStr("url"), exprStr("headers"),
        exprStr("body")))
    val withErr =
      withCall.withColumn("httpError", col("__http.httpError"))
    val unwindFlag = spec.has("unwind") && spec.get("unwind").asBoolean()
    val out = Option(spec.get("as")).map(_.asText()) match {
      case None => withErr
      case Some(as) if !unwindFlag =>
        withErr.withColumn(as, col("__http.response"))
      case Some(as) =>
        // split a JSON-array response into one message per element
        val split = udf((s: String) =>
          if (s == null) Seq.empty[String]
          else {
            val n = Js.parse(s)
            if (n.isArray) Js.elems(n).map(Js.render) else Seq(Js.render(n))
          })
        withErr.withColumn(as, explode(split(col("__http.response"))))
    }
    out.drop("__http")
  }
}

/** `$signJwt` (docs/aggregation_stages.md:591-639): sign an RS256 JWT from
  * claim expressions into the `as` field. jjwt runs on the executors.
  */
object SignJwt {

  def apply(df: DataFrame, spec: JsonNode): DataFrame = {
    val as = spec.get("as").asText()
    val pem = spec.get("privateKey").asText()
    val ttlSeconds =
      if (spec.has("ttl")) spec.get("ttl").asLong() else 5L
    def claimExpr(name: String): Column =
      if (spec.has(name)) Stages.expr(df, spec.get(name)).cast(StringType)
      else lit(null).cast(StringType)
    val extraClaims =
      if (spec.has("claims")) to_json(Stages.expr(df, spec.get("claims")))
      else lit(null).cast(StringType)

    val sign = udf((iss: String, sub: String, aud: String, kid: String,
        claims: String) => {
      val key = parsePem(pem)
      val b = io.jsonwebtoken.Jwts.builder()
      if (iss != null) b.issuer(iss)
      if (sub != null) b.subject(sub)
      if (aud != null) b.audience().add(aud)
      if (kid != null) b.header().keyId(kid).and()
      if (claims != null)
        Js.fields(Js.parse(claims)).foreach { case (k, v) =>
          b.claim(k, if (v.isTextual) v.asText() else Js.render(v))
        }
      val now = System.currentTimeMillis()
      b.issuedAt(new java.util.Date(now))
        .expiration(new java.util.Date(now + ttlSeconds * 1000))
        .signWith(key, io.jsonwebtoken.Jwts.SIG.RS256)
        .compact()
    })
    df.withColumn(as,
      sign(claimExpr("iss"), claimExpr("sub"), claimExpr("aud"),
        claimExpr("kid"), extraClaims))
  }

  private[graft] def parsePem(pem: String): java.security.PrivateKey = {
    val body = pem.replaceAll("-----[A-Z ]+-----", "").replaceAll("\\s", "")
    val bytes = java.util.Base64.getDecoder.decode(body)
    java.security.KeyFactory.getInstance("RSA")
      .generatePrivate(new java.security.spec.PKCS8EncodedKeySpec(bytes))
  }
}

/** `$s3Csv` (docs/aggregation_stages.md:696-725): per incoming message,
  * fetch a CSV object and emit one message per line; the header row names
  * the fields; values are typed long/double/string (S3CsvStage.java:246-251).
  * Values stay a JSON-string column (schemaless payload).
  */
object S3Csv {

  def apply(df: DataFrame, spec: JsonNode, env: Env): DataFrame = {
    val bucket = Stages.expr(df, spec.get("bucket")).cast(StringType)
    val key = Stages.expr(df, spec.get("key")).cast(StringType)
    val store = env.store
    val fetch = udf((b: String, k: String) => {
      val content = store.get(b, k)
      val lines = content.split("\n").filter(_.nonEmpty)
      if (lines.length < 2) Seq.empty[String]
      else {
        val header = lines.head.split(",").map(_.trim)
        lines.tail.toSeq.map { line =>
          val o = Js.obj()
          header.zip(line.split(",").map(_.trim)).foreach { case (h, v) =>
            typed(v) match {
              case l: java.lang.Long   => o.put(h, l.longValue())
              case d: java.lang.Double => o.put(h, d.doubleValue())
              case s: String           => o.put(h, s)
            }
          }
          Js.render(o)
        }
      }
    })
    df.withColumn("value", explode(fetch(bucket, key)))
  }

  /** The reference's CSV typing rule: long, else double, else string. */
  private def typed(v: String): Any =
    try java.lang.Long.valueOf(v)
    catch {
      case _: NumberFormatException =>
        try java.lang.Double.valueOf(v)
        catch { case _: NumberFormatException => v }
    }
}

/** `$s3Transfer` (docs/aggregation_stages.md:748-785): GET the url, PUT
  * the body to the object store; `as` receives the object URL, HTTP errors
  * land in httpError.
  */
object S3Transfer {
  def apply(df: DataFrame, spec: JsonNode, env: Env): DataFrame = {
    val url = Stages.expr(df, spec.get("url")).cast(StringType)
    val bucket = Stages.expr(df, spec.get("bucket")).cast(StringType)
    val key = Stages.expr(df, spec.get("key")).cast(StringType)
    val transport = env.http
    val store = env.store
    val transfer = udf((u: String, b: String, k: String) => {
      val r = transport("GET", u, null, null)
      if (r.status >= 200 && r.status < 300) {
        store.put(b, k, r.body)
        Http.CallRow(Some(s"s3://$b/$k"), None)
      } else Http.CallRow(None, Some(Http.ErrorRow(r.status, r.body)))
    })
    df.withColumn("__t", transfer(url, bucket, key))
      .withColumn(spec.get("as").asText(), col("__t.response"))
      .withColumn("httpError", col("__t.httpError"))
      .drop("__t")
  }
}

/** `$s3Attachments` (docs/aggregation_stages.md:641-694): POST objects as
  * multipart/mixed; extra attachment fields become MIME part headers.
  */
object S3Attachments {
  def apply(df: DataFrame, spec: JsonNode, env: Env): DataFrame = {
    val url = Stages.expr(df, spec.get("url")).cast(StringType)
    val attachments = to_json(Stages.expr(df, spec.get("attachments")))
    val transport = env.http
    val store = env.store
    val post = udf((u: String, attJson: String) => {
      val boundary = "graft-boundary"
      val parts = Js.elems(Js.parse(attJson)).map { a =>
        val bucket = a.get("bucket").asText()
        val key = a.get("key").asText()
        val extraHeaders = Js.fields(a).collect {
          case (k, v) if k != "bucket" && k != "key" =>
            s"$k: ${v.asText()}\r\n"
        }.mkString
        val content = store.get(bucket, key)
        s"--$boundary\r\n${extraHeaders}Content-Length: ${content.length}\r\n\r\n$content\r\n"
      }.mkString
      val body = s"$parts--$boundary--\r\n"
      val r = transport("POST", u,
        s"""{"Content-Type":"multipart/mixed; boundary=$boundary"}""", body)
      if (r.status >= 200 && r.status < 300) Http.CallRow(Some(r.body), None)
      else Http.CallRow(None, Some(Http.ErrorRow(r.status, r.body)))
    })
    df.withColumn("__t", post(url, attachments))
      .withColumn("httpError", col("__t.httpError"))
      .drop("__t")
  }
}

/** `$s3Out` (docs/aggregation_stages.md:727-746): write each message as an
  * object; passthrough output.
  */
object S3Out {
  def apply(df: DataFrame, spec: JsonNode, env: Env): DataFrame = {
    val bucket = Stages.expr(df, spec.get("bucket")).cast(StringType)
    val key = Stages.expr(df, spec.get("key")).cast(StringType)
    val store = env.store
    val put = udf((b: String, k: String, content: String) => {
      store.put(b, k, content); true
    })
    val payload = to_json(struct(df.columns.map(col): _*))
    // the put must execute per row: force it through a filter on the result
    df.withColumn("__s3ok", put(bucket, key, payload))
      .filter(col("__s3ok")).drop("__s3ok")
  }
}
