package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import graft.jq.MiniJslt
import graft.json.Js

/** Round-4 JSLT surface: the rest of the public standard library, and/or,
  * matcher minus-lists with per-value evaluation, object-scoped let,
  * dynamic indexes and slices. Expected values follow the public JSLT
  * language spec (github.com/schibsted/jslt function docs).
  */
class MiniJsltRound4Spec extends AnyFunSuite {

  private def one(script: String, in: String): JsonNode =
    MiniJslt.compile(script)(Js.parse(in))
  private def render(script: String, in: String): String =
    Js.render(one(script, in))

  test("numeric zero is false (JSLT boolean conversion)") {
    assert(render("boolean(0)", "null") == "false")
    assert(render("0 and true", "null") == "false")
    assert(render("0 or false", "null") == "false")
    assert(render("if (.n) \"yes\" else \"no\"", """{"n":0}""") ==
      "\"no\"")
    assert(render("flatten([[1,[2]],3])", "null") == "[1,2,3]")
  }

  test("and / or with JSLT truthiness") {
    assert(render(".a and .b", """{"a":1,"b":"x"}""") == "true")
    assert(render(".a and .b", """{"a":1,"b":""}""") == "false")
    assert(render(".a or .b", """{"a":null,"b":[1]}""") == "true")
    assert(render(".a or .b", """{"a":null,"b":[]}""") == "false")
    assert(render(".n > 1 and .n < 5", """{"n":3}""") == "true")
  }

  test("numeric family: round, floor, ceiling, sum, mod") {
    assert(render("round(2.5)", "null") == "3")
    assert(render("floor(2.9)", "null") == "2")
    assert(render("ceiling(2.1)", "null") == "3")
    assert(render("sum([1,2,3])", "null") == "6")
    assert(render("sum([1.5,2.5])", "null") == "4.0")
    assert(render("mod(-1, 3)", "null") == "2") // divisor's sign
    assert(render("round(null)", "null") == "null")
    assert(render("is-integer(5)", "null") == "true")
    assert(render("is-decimal(5.5)", "null") == "true")
    assert(render("is-boolean(true)", "null") == "true")
  }

  test("string family: sha256-hex, starts/ends-with, from/to-json") {
    assert(one("sha256-hex(\"abc\")", "null").asText() ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(render("""starts-with("hello", "he")""", "null") == "true")
    assert(render("""ends-with("hello", "lo")""", "null") == "true")
    assert(render("""from-json("[1,2]")""", "null") == "[1,2]")
    assert(render("""from-json("nope{", "fb")""", "null") == "\"fb\"")
    assert(render("""to-json({"a":1})""", "null") == "\"{\\\"a\\\":1}\"")
  }

  test("min/max two-value form; error(); get-key with fallback") {
    assert(render("min(3, 5)", "null") == "3")
    assert(render("max(3, 5)", "null") == "5")
    assert(render("min(null, 5)", "null") == "null")
    assert(render("""get-key({"a":1}, "a")""", "null") == "1")
    assert(render("""get-key({"a":1}, "b", 9)""", "null") == "9")
    val e = intercept[IllegalArgumentException](
      one("""error("kaput")""", "null"))
    assert(e.getMessage == "kaput")
  }

  test("array family: array, flatten, all, any, zip, zip-with-index, index-of") {
    assert(render("""array({"a":1})""", "null") ==
      """[{"key":"a","value":1}]""")
    assert(render("flatten([[1,2],[3]])", "null") == "[1,2,3]")
    assert(render("all([true,1])", "null") == "true")
    assert(render("all([true,false])", "null") == "false")
    assert(render("any([false,null,2])", "null") == "true")
    assert(render("zip([1,2],[\"a\",\"b\"])", "null") ==
      """[[1,"a"],[2,"b"]]""")
    assert(render("zip-with-index([\"a\",\"b\"])", "null") ==
      """[["a",0],["b",1]]""")
    assert(render("index-of([5,6,7], 6)", "null") == "1")
    assert(render("index-of([5,6], 9)", "null") == "-1")
  }

  test("time family: parse-time, format-time round trip") {
    assert(render(
      """parse-time("2020-01-01 00:00:00", "yyyy-MM-dd HH:mm:ss")""",
      "null") == "1577836800")
    assert(one(
      """format-time(1577836800, "yyyy-MM-dd")""", "null").asText() ==
      "2020-01-01")
    assert(one(
      """format-time(0, "yyyy-MM-dd HH", "America/New_York")""",
      "null").asText() == "1969-12-31 19")
    assert(render(
      """parse-time("x", "yyyy", null)""", "null") == "null")
  }

  test("parse-url decomposes") {
    val u = one(
      """parse-url("https://u@example.com:8080/a/b?x=1&x=2&y=z#frag")""",
      "null")
    assert(u.get("scheme").asText() == "https")
    assert(u.get("host").asText() == "example.com")
    assert(u.get("port").asInt() == 8080)
    assert(u.get("path").asText() == "/a/b")
    assert(u.get("fragment").asText() == "frag")
    assert(Js.render(u.get("parameters").get("x")) == """["1","2"]""")
  }

  test("hash-int is deterministic and key-order independent") {
    val a = one("""hash-int({"a":1,"b":2})""", "null")
    val b = one("""hash-int({"b":2,"a":1})""", "null")
    assert(a == b)
    assert(one("""hash-int("x")""", "null") ==
      one("""hash-int("x")""", "null"))
  }

  test("matcher: per-value expression and minus list") {
    assert(render("""{"id": .id, * : .}""",
      """{"id":1,"x":2,"y":3}""") == """{"id":1,"x":2,"y":3}""")
    // the matcher expression sees each VALUE as `.`
    assert(render("""{"id": .id, * : string(.)}""",
      """{"id":1,"x":2}""") == """{"id":1,"x":"2"}""")
    assert(render("""{* - secret, token : .}""",
      """{"a":1,"secret":2,"token":3}""") == """{"a":1}""")
  }

  test("object-scoped let and computed keys") {
    assert(render("""{let n = .count, "total": $n * 2}""",
      """{"count":21}""") == """{"total":42}""")
    assert(render("""{(.k): .v}""", """{"k":"name","v":7}""") ==
      """{"name":7}""")
  }

  test("dynamic indexes, negative indexes and slices") {
    assert(render(".xs[.i]", """{"xs":[9,8,7],"i":1}""") == "8")
    assert(render(".xs[-1]", """{"xs":[9,8,7]}""") == "7")
    assert(render(".xs[1:3]", """{"xs":[0,1,2,3]}""") == "[1,2]")
    assert(render(".xs[:2]", """{"xs":[0,1,2]}""") == "[0,1]")
    assert(render(".s[2:]", """{"s":"abcde"}""") == "\"cde\"")
    assert(render(""".m["a b"]""", """{"m":{"a b":5}}""") == "5")
    assert(render("""."odd key"""", """{"odd key":1}""") == "1")
  }

  test("postfix paths after parens and calls") {
    assert(render("""(.a + .b).x""",
      """{"a":{"x":1},"b":{"y":2}}""") == "1")
    assert(render("""capture("a1", "(?<d>[0-9])").d""", "null") == "\"1\"")
    assert(render("""split("a,b,c", ",")[1]""", "null") == "\"b\"")
  }

  test("object-for with condition; array + concat") {
    assert(render("""{for (.xs) string(.k) : .v if (.v > 1)}""",
      """{"xs":[{"k":1,"v":1},{"k":2,"v":5}]}""") == """{"2":5}""")
    assert(render("[1,2] + [3]", "null") == "[1,2,3]")
  }

  test("object-for over an object exposes key/value") {
    assert(render("""{for (.m) .key : .value + 1}""",
      """{"m":{"a":1,"b":2}}""") == """{"a":2,"b":3}""")
  }
}
