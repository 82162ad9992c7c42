package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.json.Js
import graft.op.{Env, Pipeline}
import graft.streaming.{AppRunner, FileStreamIo}

/** Round-9 fidelity and scale hardening:
  *  - variant (schemaless) model: an EXPLICIT JSON null field is a
  *    variant-null, not SQL NULL — `{f:null}`/`{$eq:null}` must match it
  *    and `{$ne:null}`/`{$nin:[null,..]}` must not (MongoDB null-equality
  *    semantics, reference docs/query.md:64-84);
  *  - `$in`/`$nin` extraction hints come from the first NON-null list
  *    element (a null hint extracts the raw variant and compares
  *    variant-vs-literal);
  *  - Mongo truthiness for variant strings: every string — "", "false",
  *    "0" — is truthy (only bool false and numeric 0 are falsy);
  *  - `$split` runtime delimiters containing the literal `\E` sequence
  *    stay literal (Pattern.quote semantics), and a null delimiter on a
  *    non-null input errors like Mongo instead of silently yielding null;
  *  - `routeLateBatch` fails fast past its serial-replay row cap.
  */
class Round9HardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def write(dir: String, topic: String, name: String,
      json: String): Unit = {
    Files.createDirectories(Paths.get(s"$dir/$topic"))
    Files.writeString(Paths.get(s"$dir/$topic/$name.json"), json)
  }

  /** Run one $match over four schemaless docs: explicit null field,
    * present number, absent field, present string. Returns matched keys.
    */
  private def matchKeys(cond: String): Seq[String] = {
    val dir = Files.createTempDirectory("graft-r9").toString
    val out = "out_r9_" + math.abs(cond.hashCode).toString
    write(dir, "t", "m1", """{"_id":"n","f":null}""")
    write(dir, "t", "m2", """{"_id":"v","f":1}""")
    write(dir, "t", "m3", """{"_id":"m"}""")
    write(dir, "t", "m4", """{"_id":"s","f":"x"}""")
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      s"""{"application":"r9","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"t","toTopic":"$out",
            "pipeline":[{"$$match":{"f":$cond}}]}]}""")
    io.processAll()
    val keys = spark.table(out).collect()
      .map(_.getAs[String]("key")).toSeq.sorted
    io.stopAll()
    keys
  }

  test("variant: {f:null} and {$eq:null} match explicit JSON null") {
    // Mongo: null matches stored null AND missing; the explicit
    // {"f":null} doc is a variant-null, not SQL NULL
    assert(matchKeys("null") == Seq("m", "n"))
    assert(matchKeys("""{"$eq":null}""") == Seq("m", "n"))
  }

  test("variant: {$ne:null} excludes explicit JSON null") {
    assert(matchKeys("""{"$ne":null}""") == Seq("s", "v"))
  }

  test("variant: $in/$nin with null handle explicit JSON null") {
    // the string doc "s" must NOT count as null (a typed extraction
    // mismatch is not a null field)
    assert(matchKeys("""{"$in":[null,1]}""") == Seq("m", "n", "v"))
    assert(matchKeys("""{"$nin":[null,2]}""") == Seq("s", "v"))
  }

  test("variant: $in hint comes from the first NON-null element") {
    // [null,1] must still extract f as double for the isin(1) compare —
    // the r8 code hinted off the null head and compared raw variants
    assert(matchKeys("""{"$in":[1,null]}""") == Seq("m", "n", "v"))
    assert(matchKeys("""{"$in":[null,2]}""") == Seq("m", "n"))
  }

  test("variant truthiness: strings are always truthy, 0/false falsy") {
    val dir = Files.createTempDirectory("graft-r9t").toString
    write(dir, "t", "m1",
      """{"_id":"a","sf":"false","s0":"0","se":"","n0":0,""" +
        """"bf":false,"nn":null,"b1":true,"n2":2.5}""")
    val io = new FileStreamIo(dir, Map.empty)
    new AppRunner(spark, io, Env(spark)).run(
      """{"application":"r9t","version":"1.0","parts":[
           {"type":"stream","name":"s","fromTopic":"t","toTopic":"out_r9t",
            "pipeline":[{"$project":{
              "tsf":{"$cond":{"if":"$sf","then":1,"else":0}},
              "ts0":{"$cond":{"if":"$s0","then":1,"else":0}},
              "tse":{"$cond":{"if":"$se","then":1,"else":0}},
              "tn0":{"$cond":{"if":"$n0","then":1,"else":0}},
              "tbf":{"$cond":{"if":"$bf","then":1,"else":0}},
              "tnn":{"$cond":{"if":"$nn","then":1,"else":0}},
              "tmiss":{"$cond":{"if":"$absent","then":1,"else":0}},
              "tb1":{"$cond":{"if":"$b1","then":1,"else":0}},
              "tn2":{"$cond":{"if":"$n2","then":1,"else":0}}}}]}]}""")
    io.processAll()
    val v = Js.parse(
      spark.table("out_r9t").collect().head.getAs[String]("value"))
    // every string — even "false", "0", "" — is truthy in Mongo
    assert(v.get("tsf").asLong() == 1, "string \"false\" must be truthy")
    assert(v.get("ts0").asLong() == 1, "string \"0\" must be truthy")
    assert(v.get("tse").asLong() == 1, "empty string must be truthy")
    assert(v.get("tn0").asLong() == 0)
    assert(v.get("tbf").asLong() == 0)
    assert(v.get("tnn").asLong() == 0)
    assert(v.get("tmiss").asLong() == 0)
    assert(v.get("tb1").asLong() == 1)
    assert(v.get("tn2").asLong() == 1)
    io.stopAll()
  }

  test("$split runtime delimiter containing \\E stays literal") {
    val df = Seq(("x\\Ey\\Ez", "\\E"), ("a|b", "|")).toDF("s", "d")
    val out = Pipeline.run(df,
      """[{"$project":{"parts":{"$split":["$s","$d"]}}}]""", Env(spark))
      .collect().map(_.getSeq[String](0)).toSeq
    // "\E" would close the \Q..\E quote and leak regex without the
    // Pattern.quote-style re-escape
    assert(out == Seq(Seq("x", "y", "z"), Seq("a", "b")))
  }

  test("$split null delimiter on a non-null input errors like Mongo") {
    val df = Seq(("a.b", Option.empty[String])).toDF("s", "d")
    val e = intercept[Exception] {
      Pipeline.run(df,
        """[{"$project":{"parts":{"$split":["$s","$d"]}}}]""", Env(spark))
        .collect()
    }
    assert(e.getMessage.contains("non-null string delimiter") ||
      Option(e.getCause).exists(
        _.getMessage.contains("non-null string delimiter")))
    // null INPUT still propagates null, Mongo-style — no error
    val df2 = Seq((Option.empty[String], "|")).toDF("s", "d")
    val r = Pipeline.run(df2,
      """[{"$project":{"parts":{"$split":["$s","$d"]}}}]""", Env(spark))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("routeLateBatch refuses a frame past its serial-replay cap") {
    val packed = spark.range(100).select(
      col("id"), lit("retry").as("topic"),
      timestamp_millis(col("id") * 1000).as("deliverAt"))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StatefulOps.routeLateBatch(
        packed, latenessMs = 10L, dlqTopic = "dlq", ord = col("id"),
        maxRows = 50L)
    }
    assert(e.getMessage.contains("SERIAL"))
    // under the cap it still routes
    val ok = graft.streaming.StatefulOps.routeLateBatch(
      packed.limit(10), latenessMs = 10L, dlqTopic = "dlq",
      ord = col("id"), maxRows = 50L)
    assert(ok.count() == 10)
  }
}
