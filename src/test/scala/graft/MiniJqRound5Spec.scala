package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Js
import graft.jq.MiniJq

/** The jq tail builtins added in round 5 — label/break, input/inputs,
  * env/$ENV, halt, $__loc__ — plus the parser/evaluator hardening from the
  * round-4 advice (end-of-input assertion, string-only computed object
  * keys, total delpaths ordering).
  */
class MiniJqRound5Spec extends AnyFunSuite {

  private def all(script: String, in: String): Seq[String] =
    MiniJq.compileAll(script)(Js.parse(in)).map(Js.render)
  private def one(script: String, in: String): String =
    Js.render(MiniJq.compile(script)(Js.parse(in)))

  test("label/break truncates the stream, keeping prior outputs") {
    assert(all("label $out | (1,2,break $out,3)", "null") == Seq("1", "2"))
    // the jq manual's foreach early-exit shape
    assert(all(
      """label $out | foreach .[] as $item (null;
           if $item == 3 then break $out else $item end)""",
      "[1,2,3,4]") == Seq("1", "2"))
  }

  test("outputs before break keep flowing through later pipe stages") {
    assert(all("label $o | (1,2,break $o) | . * 10", "null") ==
      Seq("10", "20"))
  }

  test("break crosses try without being caught as an error") {
    assert(all("""label $o | try (1, break $o) catch "swallowed"""",
      "null") == Seq("1"))
  }

  test("break without a matching label is an error") {
    val e = intercept[IllegalArgumentException](all("break $nope", "null"))
    assert(e.getMessage.contains("nope"))
  }

  test("nested labels: break escapes to the nearest matching one") {
    assert(all(
      "label $a | (label $b | (1, break $b, 2)), 9", "null") ==
      Seq("1", "9"))
    assert(all(
      "label $a | (label $b | (1, break $a, 2)), 9", "null") ==
      Seq("1"))
  }

  test("an aborted collection emits nothing (jq array semantics)") {
    assert(all("label $o | [1, 2, break $o]", "null") == Seq.empty)
  }

  test("input errors when the single input is consumed; inputs is empty") {
    assert(one("try input catch .", "null") == "\"No more inputs\"")
    assert(one("[inputs]", "null") == "[]")
  }

  test("env and $ENV expose the environment") {
    assert(one("""env | has("PATH")""", "null") == "true")
    assert(one("$ENV.PATH == env.PATH", "null") == "true")
    assert(Js.parse(one("env.PATH", "null")).asText() == sys.env("PATH"))
  }

  test("halt stops the program, keeping outputs already emitted") {
    assert(all("1, 2, halt, 3", "null") == Seq("1", "2"))
    assert(all("halt", "null") == Seq.empty)
  }

  test("halt_error raises the input as the error") {
    val e = intercept[IllegalArgumentException](
      all(""""boom" | halt_error""", "null"))
    assert(e.getMessage == "boom")
  }

  test("$__loc__ reports file and source line") {
    assert(one("$__loc__", "null") == """{"file":"<stdin>","line":1}""")
    assert(one("\n\n$__loc__", "null") == """{"file":"<stdin>","line":3}""")
    // postfix paths apply like on any variable (valid jq)
    assert(one("$__loc__.file", "null") == "\"<stdin>\"")
    assert(one("$__loc__[\"line\"]", "null") == "1")
  }

  test("trailing tokens after the program are a parse error") {
    // jq rejects chained assignment; silently dropping '= 1' is worse
    val e = intercept[IllegalArgumentException](one(".a = .b = 1", "{}"))
    assert(e.getMessage.contains("unexpected token"))
  }

  test("computed object keys must be strings") {
    val e = intercept[IllegalArgumentException](
      one("{(.o): 1}", """{"o":{"x":1}}"""))
    assert(e.getMessage.contains("Object keys must be strings"))
    assert(one("{(.k): 1}", """{"k":"good"}""") == """{"good":1}""")
  }

  test("tostream emits [path,leaf] pairs and closing events") {
    assert(all("tostream", """{"a":[1,2]}""") == Seq(
      """[["a",0],1]""", """[["a",1],2]""", """[["a",1]]""", """[["a"]]"""))
    assert(all("tostream", "1") == Seq("[[],1]"))
    assert(all("tostream", """{"a":[]}""") == Seq(
      """[["a"],[]]""", """[["a"]]"""))
  }

  test("fromstream(tostream) round-trips any document") {
    val doc = """{"a":[1,{"b":"x"},[]],"c":null,"d":{"e":[true,false]}}"""
    assert(one(". as $dot | fromstream($dot | tostream) == $dot", doc) ==
      "true")
    assert(one("fromstream(tostream)", "42") == "42")
  }

  test("delpaths with many mixed key/index paths sorts totally") {
    // 64 equal-length paths mixing a string key and an int index at the
    // SAME position: the old sortWith comparator ranked such pairs
    // "equal" to both neighbors while int/int and string/string pairs
    // ordered, violating TimSort's contract on 32+ paths
    val doc = Js.obj()
    val paths = Js.arr()
    (0 until 32).foreach { i =>
      doc.set[com.fasterxml.jackson.databind.JsonNode](s"k$i",
        Js.parse(s"""{"x":$i,"y":$i}"""))
      paths.add(Js.parse(s"""["k$i", "x"]"""))  // (key, key)
      paths.add(Js.parse(s"""[$i, "x"]"""))     // (index, key): no-op on
    }                                           // an object root
    val cleaned =
      MiniJq.compile(s"delpaths(${Js.render(paths)})")(doc)
    (0 until 32).foreach { i =>
      val k = cleaned.get(s"k$i")
      assert(k != null && !k.has("x") && k.has("y"),
        s"k$i wrong after delpaths: $k")
    }
  }
}
