package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import graft.jq.MiniJq
import graft.json.Js

/** The round-4 jq surface: sorting/grouping, entries, paths, assignment
  * operators, slices, and/or, recursion, format strings, regex family,
  * math, dates. Expected values follow jq 1.7 (public language manual).
  */
class MiniJqRound4Spec extends AnyFunSuite {

  private def one(script: String, in: String): JsonNode =
    MiniJq.compile(script)(Js.parse(in))
  private def render(script: String, in: String): String =
    Js.render(one(script, in))
  private def stream(script: String, in: String): String =
    MiniJq.compileAll(script)(Js.parse(in)).map(Js.render).mkString(" ")

  test("sort, sort_by, unique, unique_by, reverse") {
    assert(render("sort", "[3,null,1,\"a\",true,2]") ==
      """[null,true,1,2,3,"a"]""")
    assert(render("sort_by(.k)", """[{"k":2},{"k":1},{"k":3}]""") ==
      """[{"k":1},{"k":2},{"k":3}]""")
    assert(render("unique", "[1,3,1,2,3]") == "[1,2,3]")
    assert(render("unique_by(.k)", """[{"k":1,"v":1},{"k":1,"v":2},{"k":2,"v":3}]""") ==
      """[{"k":1,"v":1},{"k":2,"v":3}]""")
    assert(render("reverse", "[1,2,3]") == "[3,2,1]")
    assert(render("reverse", "\"abc\"") == "\"cba\"")
  }

  test("group_by groups sorted runs; min/max/min_by/max_by") {
    assert(render("group_by(.k) | map(length)",
      """[{"k":"a"},{"k":"b"},{"k":"a"}]""") == "[2,1]")
    assert(render("min", "[3,1,2]") == "1")
    assert(render("max", "[3,1,2]") == "3")
    assert(render("min", "[]") == "null")
    assert(render("min_by(.v)", """[{"v":2},{"v":1}]""") == """{"v":1}""")
    assert(render("max_by(.v)", """[{"v":2},{"v":1}]""") == """{"v":2}""")
  }

  test("to_entries / from_entries / with_entries / map_values") {
    assert(render("to_entries", """{"a":1,"b":2}""") ==
      """[{"key":"a","value":1},{"key":"b","value":2}]""")
    assert(render("from_entries",
      """[{"key":"a","value":1},{"name":"b","v":2}]""") ==
      """{"a":1,"b":2}""")
    assert(render("with_entries(.value += 1)", """{"a":1}""") ==
      """{"a":2}""")
    assert(render("map_values(. * 2)", """{"a":1,"b":2}""") ==
      """{"a":2,"b":4}""")
    assert(render("map_values(.+1)", "[1,2]") == "[2,3]")
  }

  test("any / all in all arities") {
    assert(render("any", "[false,true]") == "true")
    assert(render("all", "[false,true]") == "false")
    assert(render("any(. > 2)", "[1,2,3]") == "true")
    assert(render("all(. > 0)", "[1,2,3]") == "true")
    assert(render("any(.[]; . == 2)", "[1,2]") == "true")
    assert(render("all", "[]") == "true")
    assert(render("any", "[]") == "false")
  }

  test("paths, leaf_paths, getpath, setpath, delpaths, path(f)") {
    assert(stream("paths", """{"a":[1],"b":2}""") ==
      """["a"] ["a",0] ["b"]""")
    assert(stream("leaf_paths", """{"a":[1],"b":2}""") ==
      """["a",0] ["b"]""")
    assert(render("""getpath(["a","b"])""", """{"a":{"b":7}}""") == "7")
    assert(render("""setpath(["a","b"]; 5)""", """{"a":{"b":7}}""") ==
      """{"a":{"b":5}}""")
    assert(render("""setpath(["x",1]; 9)""", "{}") ==
      """{"x":[null,9]}""")
    assert(render("""delpaths([["a"],["b",0]])""",
      """{"a":1,"b":[9,8],"c":3}""") == """{"b":[8],"c":3}""")
    assert(stream("path(.a[].b)", """{"a":[{"b":1},{"b":2}]}""") ==
      """["a",0,"b"] ["a",1,"b"]""")
  }

  test("assignment operators rebuild at the designated paths") {
    assert(render(".a = 5", """{"a":1,"b":2}""") == """{"a":5,"b":2}""")
    assert(render(".a.b |= . + 1", """{"a":{"b":41}}""") ==
      """{"a":{"b":42}}""")
    assert(render(".xs[] += 10", """{"xs":[1,2]}""") ==
      """{"xs":[11,12]}""")
    assert(render(".a //= 5", """{"a":null}""") == """{"a":5}""")
    assert(render(".a //= 5", """{"a":1}""") == """{"a":1}""")
    assert(render(".c = 1", "{}") == """{"c":1}""")
    assert(render("(.a, .b) = 0", """{"a":1,"b":2}""") ==
      """{"a":0,"b":0}""")
    assert(render(".n *= 3", """{"n":7}""") == """{"n":21}""")
  }

  test("del with indexes, multiple targets, nested paths") {
    assert(render("del(.a[0])", """{"a":[1,2,3]}""") == """{"a":[2,3]}""")
    assert(render("del(.a, .b)", """{"a":1,"b":2,"c":3}""") ==
      """{"c":3}""")
    assert(render("del(.a[1], .a[0])", """{"a":[1,2,3]}""") ==
      """{"a":[3]}""")
  }

  test("slices, negative indexes, string keys") {
    assert(render(".[1:3]", "[0,1,2,3,4]") == "[1,2]")
    assert(render(".[-2:]", "[0,1,2,3]") == "[2,3]")
    assert(render(".[:2]", "[0,1,2]") == "[0,1]")
    assert(render(".[2:]", "\"abcde\"") == "\"cde\"")
    assert(render(".[-1]", "[1,2,3]") == "3")
    assert(render(""".["a b"]""", """{"a b":7}""") == "7")
  }

  test("and / or / not and % arithmetic") {
    assert(render("1 and true", "null") == "true")
    assert(render("null or false", "null") == "false")
    assert(render("(.a > 1) and (.b < 5)", """{"a":2,"b":3}""") == "true")
    assert(render("7 % 3", "null") == "1")
    assert(render(".a % 2 == 0", """{"a":4}""") == "true")
  }

  test("recursive descent and recurse(f)") {
    assert(stream("..", """{"a":[1]}""") == """{"a":[1]} [1] 1""")
    assert(stream("recurse(.next // empty) | .v", // jq linked-list idiom
      """{"v":1,"next":{"v":2}}""") == "1 2")
    assert(render("[.. | numbers]", """{"a":[1,{"b":2}]}""") == "[1,2]")
  }

  test("limit, nth, until, while, 3-arg range") {
    assert(render("[limit(2; .[])]", "[1,2,3,4]") == "[1,2]")
    assert(render("nth(1)", "[9,8,7]") == "8")
    assert(render("nth(2; range(10))", "null") == "2")
    assert(render("until(. > 100; . * 2)", "1") == "128")
    assert(render("[while(. < 10; . * 3)]", "1") == "[1,3,9]")
    assert(render("[range(0; 10; 3)]", "null") == "[0,3,6,9]")
  }

  test("flatten, transpose, index family") {
    assert(render("flatten", "[1,[2,[3]]]") == "[1,2,3]")
    assert(render("flatten(1)", "[1,[2,[3]]]") == "[1,2,[3]]")
    assert(render("transpose", "[[1,2],[3,4]]") == "[[1,3],[2,4]]")
    assert(render("""index("b")""", "\"abcb\"") == "1")
    assert(render("""rindex("b")""", "\"abcb\"") == "3")
    assert(render("""indices("b")""", "\"abcb\"") == "[1,3]")
    assert(render("index(2)", "[1,2,3]") == "1")
    assert(render("indices([1,2])", "[0,1,2,1,2]") == "[1,3]")
  }

  test("json conversion and format strings") {
    assert(render("tojson", """{"a":1}""") == "\"{\\\"a\\\":1}\"")
    assert(render("fromjson", "\"[1,2]\"") == "[1,2]")
    assert(render("explode", "\"ab\"") == "[97,98]")
    assert(render("implode", "[97,98]") == "\"ab\"")
    assert(render("@base64", "\"hi\"") == "\"aGk=\"")
    assert(render("@base64d", "\"aGk=\"") == "\"hi\"")
    assert(render("@csv", """[1,"a,b",null]""") == "\"1,\\\"a,b\\\",\"")
    assert(render("@tsv", """["a\tb",1]""") == "\"a\\\\tb\\t1\"")
    assert(render("@uri", "\"a b\"") == "\"a%20b\"")
    assert(render("@html", "\"<a>\"") == "\"&lt;a&gt;\"")
  }

  test("math builtins") {
    assert(render("ceil", "1.2") == "2")
    assert(render("round", "1.5") == "2")
    assert(render("round", "-1.5") == "-2") // C round: half away from zero
    assert(render("sqrt", "9") == "3.0")
    assert(render("pow(2; 10)", "null") == "1024.0")
    assert(render("abs", "-3") == "3")
    assert(render("fabs", "-3.5") == "3.5")
    assert(render("infinite > 1e308", "null") == "true")
    assert(render("isnan", "1") == "false")
    assert(render("log2", "8") == "3.0")
  }

  test("dates") {
    assert(render("todate", "0") == "\"1970-01-01T00:00:00Z\"")
    assert(render("fromdate", "\"1970-01-02T00:00:00Z\"") == "86400")
  }

  test("regex: match, scan, splits, split with flags, test flags") {
    assert(render("""[match("o"; "g")] | length""", "\"foo\"") == "2")
    assert(render("""match("(?<x>[0-9]+)").captures[0].string""",
      "\"ab123\"") == "\"123\"")
    assert(render("""match("o").offset""", "\"foo\"") == "1")
    assert(stream("""scan("[0-9]+")""", "\"a1b22\"") == "\"1\" \"22\"")
    assert(render("""[splits("[,;]")]""", "\"a,b;c\"") ==
      """["a","b","c"]""")
    assert(render("""split("[,;]"; "")""", "\"a,b;c\"") ==
      """["a","b","c"]""")
    assert(render("""test("ABC"; "i")""", "\"xabcx\"") == "true")
  }

  test("capture names bind to the right groups; flags honored") {
    // unnamed group BEFORE the named one: name must not shift
    assert(render("""match("(a)(?<x>b)").captures | map(.name)""",
      "\"ab\"") == """[null,"x"]""")
    assert(render("""match("(a)(?<x>b)").captures[1].string""",
      "\"ab\"") == "\"b\"")
    assert(render("""capture("(?<a>B)"; "i")""", "\"ab\"") ==
      """{"a":"b"}""")
    assert(render("""[capture("(?<d>[0-9])"; "g")]""", "\"a1b2\"") ==
      """[{"d":"1"},{"d":"2"}]""")
    // jq: no match -> empty stream, not {}
    assert(render("""[capture("(?<d>[0-9])"; "g")]""", "\"abc\"") == "[]")
    // '(?<' inside a character class is not a named group
    assert(render("""gsub("[(?<x>]"; "_")""", "\"a(b\"") == "\"a_b\"")
  }

  test("@uri percent-encodes non-ASCII by UTF-8 bytes") {
    assert(render("@uri", "\"café\"") == "\"caf%C3%A9\"")
    assert(render("@uri", "\"a b\"") == "\"a%20b\"")
  }

  test("contains, inside, in") {
    assert(render("""contains("bc")""", "\"abcd\"") == "true")
    assert(render("""contains({"a":1})""", """{"a":1,"b":2}""") == "true")
    assert(render("contains([1])", "[1,2]") == "true")
    assert(render("""inside("abcd")""", "\"bc\"") == "true")
    assert(render("""in({"a":1})""", "\"a\"") == "true")
    assert(render("in([9,8])", "1") == "true")
    assert(render("in([9,8])", "5") == "false")
  }

  test("object construction shorthand and computed keys") {
    assert(render("{a}", """{"a":1,"b":2}""") == """{"a":1}""")
    assert(render(""". as $x | {$x}""", "5") == """{"x":5}""")
    assert(render("""{(.k): .v}""", """{"k":"name","v":1}""") ==
      """{"name":1}""")
    assert(render("""{a, b: 10}""", """{"a":1}""") ==
      """{"a":1,"b":10}""")
  }

  test("destructuring patterns in as-bindings") {
    assert(render(". as [$a, $b] | $a + $b", "[3,4]") == "7")
    assert(render(". as {x: $v} | $v", """{"x":9}""") == "9")
    assert(render(". as {$x} | $x", """{"x":1}""") == "1")
    assert(render(". as {pts: [$p0, $p1], "
      + """"n": $n} | [$p0, $p1, $n]""",
      """{"pts":[5,6],"n":2}""") == "[5,6,2]")
    // missing elements/fields bind null
    assert(render(". as [$a, $b] | $b", "[1]") == "null")
  }

  test("elif chains") {
    val f = MiniJq.compile(
      "if . < 0 then \"neg\" elif . == 0 then \"zero\" else \"pos\" end")
    assert(f(Js.parse("-1")).asText() == "neg")
    assert(f(Js.parse("0")).asText() == "zero")
    assert(f(Js.parse("3")).asText() == "pos")
  }

  test("error and try/catch get the message") {
    assert(render("""try error("boom") catch .""", "null") == "\"boom\"")
    assert(stream("""error("x")?""", "null") == "")
  }

  test("type stream filters and jq values semantics") {
    assert(render("[.[] | numbers]", """[1,"a",null,2]""") == "[1,2]")
    assert(render("[.[] | values]", """[1,null,"a"]""") == """[1,"a"]""")
    assert(render("[.[] | strings]", """[1,"a"]""") == """["a"]""")
    assert(render("keys_unsorted", """{"b":1,"a":2}""") == """["b","a"]""")
  }

  test("walk transforms bottom-up") {
    assert(render(
      """walk(if type == "number" then . + 1 else . end)""",
      """{"a":[1,{"b":2}]}""") == """{"a":[2,{"b":3}]}""")
  }

  test("array difference and object deep merge") {
    assert(render(". - [2]", "[1,2,3,2]") == "[1,3]")
    assert(render("""{"a":{"x":1}} * {"a":{"y":2}}""", "null") ==
      """{"a":{"x":1,"y":2}}""")
  }

  test("sub/gsub evaluate the replacement against the capture object") {
    assert(render("""gsub("(?<x>[0-9])"; "<\(.x)>")""", "\"a1b2\"") ==
      "\"a<1>b<2>\"")
    assert(render("""sub("(?<x>[0-9])"; "<\(.x)>")""", "\"a1b2\"") ==
      "\"a<1>b2\"")
    assert(render("""gsub("-"; "_")""", "\"a-b-c\"") == "\"a_b_c\"")
    assert(render("""sub("O"; "0"; "i")""", "\"foo\"") == "\"f0o\"")
  }

  test("string repeat and string division") {
    assert(render("\"ab\" * 3", "null") == "\"ababab\"")
    assert(render("\"x\" * 0", "null") == "null")
    assert(render("\"a,b,c\" / \",\"", "null") == """["a","b","c"]""")
  }

  test("utf8bytelength, trim family") {
    assert(render("utf8bytelength", "\"é\"") == "2")
    assert(render("trim", "\"  x \"") == "\"x\"")
    assert(render("ltrim", "\" x \"") == "\"x \"")
    assert(render("rtrim", "\" x \"") == "\" x\"")
  }
}
