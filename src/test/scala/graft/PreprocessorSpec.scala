package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.op.{Env, Pipeline}
import graft.streaming.AppRunner

/** Aggregate/command preprocessors (docs/state.md:53,61), validator
  * includes (docs/validator.md), $convert onNull/onError, and the driver's
  * flagship entry query.
  */
class PreprocessorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("command-level preprocessor applies only to that command") {
    val cmds = Seq(
      ("p1", "put", 1L, 10),
      ("p1", "bump", 2L, 0))
      .toDF("_id", "_command", "__ord", "v")
      .withColumn("_jwt", struct(lit("system").as("sub")))
    val io = new TestIo(Map("pp-item-command" -> cmds))
    // the bump preprocessor rewrites it into a patch; put is untouched
    val streams = new AppRunner(spark, io, Env(spark)).run(
      """{"application":"pp","version":"1.0","parts":[
           {"type":"aggregate","aggregateType":"pp-item",
            "commands":{"bump":{
              "preprocessor":[
                {"$addFields":{"_command":"patch",
                   "_ops":[{"op":{"$literal":"replace"},
                            "path":{"$literal":"/v"},"value":99}]}}]}}}]}""")
    val last = streams("pp-item-aggregate")
      .select("value").as[String].collect().map(Js.parse)
      .maxBy(_.get("_seq").asLong())
    assert(last.get("v").asInt() == 99)
    assert(last.get("_seq").asLong() == 1)
  }

  test("validator include merges conditions from files") {
    val scripts = Map(
      "base.yml" ->
        """conditions:
          |  - a:
          |      $exists: true
          |    $code: "A_REQ"
          |""".stripMargin)
    val env = Env(spark, scripts = scripts)
    val df = Seq(("x", 1, 0)).toDF("_id", "b", "a")
      .withColumn("a", lit(null).cast("int"))
    val out = Pipeline.run(df,
      """[{"$validate":{"include":["base.yml"],
           "conditions":[{"b":{"$gte":5},"$code":"B_MIN"}]}},
          {"$project":{"_id":1,
            "codes":{"$map":{"input":"$errors","as":"e","in":"$$e.code"}}}}]""",
      env).collect().head
    assert(out.getSeq[String](1).sorted == Seq("A_REQ", "B_MIN"))
  }

  test("validator macros expand, includer wins, refs see only their own") {
    val scripts = Map(
      "macros.yml" ->
        """macros:
          |  pos:
          |    $gte: 0
          |    $code: "NEG"
          |""".stripMargin,
      "jwt.yml" ->
        """conditions:
          |  - sub:
          |      $exists: true
          |      $code: "NOSUB"
          |""".stripMargin,
      "v.yml" ->
        """include:
          |  - "macros.yml"
          |conditions:
          |  - value: "_pos_"
          |  - _jwt:
          |      ref: "jwt.yml"
          |""".stripMargin)
    val resolved = graft.op.Validate.resolve(
      graft.json.Js.parse("\"v.yml\""), scripts)
    val conds = graft.json.Js.elems(resolved.get("conditions"))
    // _pos_ expanded to the macro body
    assert(conds.exists(c => c.has("value") &&
      c.get("value").has("$gte") &&
      c.get("value").get("$code").asText() == "NEG"))
    // ref replaced by the referred validator's resolved contents
    assert(conds.exists(c => c.has("_jwt") &&
      c.get("_jwt").has("conditions")))

    // evaluation: nested validator errors carry the prefixed location
    val bad = graft.json.Js.parse(
      """{"_id":"x","value":-3,"_jwt":{"role":"admin"}}""")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val errors = graft.json.Js.elems(
      graft.streaming.JsonValidator.validate(resolved, bad, None))
    assert(errors.exists(e => e.get("code").asText() == "NEG" &&
      e.get("location").asText() == "/value"))
    assert(errors.exists(e => e.get("code").asText() == "NOSUB" &&
      e.get("location").asText() == "/_jwt"))
  }

  test("$convert distinguishes onNull from onError") {
    val df = Seq(("ok", "12"), ("bad", "xyz"), ("nul", null))
      .toDF("_id", "s")
    val out = Pipeline.run(df,
      """[{"$project":{"_id":1,
           "r":{"$convert":{"input":"$s","to":"int",
                            "onError":-1,"onNull":-2}}}}]""",
      Env(spark)).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ok" -> 12L, "bad" -> -1L, "nul" -> -2L))
  }

  test("flagship entry returns rows") {
    graft.queries.Q.session(spark)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
