package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.jq.MiniJq
import graft.json.Js

class MiniJqSpec extends AnyFunSuite {

  test("paths, pipes and object construction") {
    val f = MiniJq.compile("""{ "v": .a.b | . + 1, "w": .name }""")
    val out = f(Js.parse("""{"a":{"b":41},"name":"x"}"""))
    assert(out.get("v").asLong() == 42)
    assert(out.get("w").asText() == "x")
  }

  test("object merge with + keeps right-hand fields") {
    val f = MiniJq.compile(""".state + { "value": .state.value | . + 1 }""")
    val out = f(Js.parse("""{"state":{"_id":"a","value":1,"other":true}}"""))
    assert(out.get("value").asLong() == 2)
    assert(out.get("_id").asText() == "a")
    assert(out.get("other").asBoolean())
  }

  test("def filters and imports") {
    val lib = "def decr: . - 1;\ndef incr: . + 1;"
    val f = MiniJq.compile(
      """import "lib.jq" as op;
        |.state + { "value" : .state.value | op::incr }""".stripMargin,
      load = { case "lib.jq" => lib })
    val out = f(Js.parse("""{"state":{"value":5}}"""))
    assert(out.get("value").asLong() == 6)
  }

  test("del removes a field") {
    val f = MiniJq.compile(""".command | del(._command)""")
    val out = f(Js.parse("""{"command":{"_command":"put","v":3}}"""))
    assert(!out.has("_command"))
    assert(out.get("v").asInt() == 3)
  }

  test("arithmetic: longs stay longs, division is double") {
    val f = MiniJq.compile("""{ "a": .x * 3, "b": .x / 2, "c": .x - 1 }""")
    val out = f(Js.parse("""{"x":10}"""))
    assert(out.get("a").asLong() == 30)
    assert(out.get("b").asDouble() == 5.0)
    assert(out.get("c").asLong() == 9)
  }

  test("if/then/else with comparison operators") {
    val f = MiniJq.compile(
      """{ "grade": if .score >= 60 then "pass" else "fail" end,
           "max": if .score > .cap then .cap else .score end,
           "same": .a == .b }""")
    val out = f(Js.parse("""{"score":75,"cap":70,"a":1,"b":1}"""))
    assert(out.get("grade").asText() == "pass")
    assert(out.get("max").asLong() == 70)
    assert(out.get("same").asBoolean())
    val out2 = f(Js.parse("""{"score":30,"cap":70,"a":1,"b":2}"""))
    assert(out2.get("grade").asText() == "fail")
    assert(!out2.get("same").asBoolean())
  }

  test("if without else passes the input through") {
    val f = MiniJq.compile(
      """.state | if .n == 0 then { "n": 1 } end""")
    assert(f(Js.parse("""{"state":{"n":0}}""")).get("n").asInt() == 1)
    assert(f(Js.parse("""{"state":{"n":5}}""")).get("n").asInt() == 5)
  }

  test("string concat and array construction") {
    val f = MiniJq.compile("""{ "s": .a + "-" + .b, "l": [.a, .b, 3] }""")
    val out = f(Js.parse("""{"a":"x","b":"y"}"""))
    assert(out.get("s").asText() == "x-y")
    assert(out.get("l").size() == 3)
  }
}

/** Round-2 language upgrades: JQ streams (.[], comma, collect) and JSLT
  * let/if.
  */
class MiniLangSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.{MiniJq, MiniJslt}
  import graft.json.Js

  test("JQ binary operators iterate the right operand in the outer loop") {
    // jq: (1,2)+(10,20) → 11,12,21,22
    val all = MiniJq.compileAll("""(1,2)+(10,20)""")(Js.parse("{}"))
    assert(all.map(_.asInt()) == Seq(11, 12, 21, 22))
  }

  test("JQ .[] iterates, [..] collects, comma concatenates") {
    val all = MiniJq.compileAll(""".items[] | .v""")(
      Js.parse("""{"items":[{"v":1},{"v":2},{"v":3}]}"""))
    assert(all.map(_.asInt()) == Seq(1, 2, 3))

    val collected = MiniJq.compile("""[.items[] | .v * 10]""")(
      Js.parse("""{"items":[{"v":1},{"v":2}]}"""))
    assert(collected.isArray && Js.elems(collected).map(_.asInt()) == Seq(10, 20))

    val comma = MiniJq.compileAll(""".a, .b""")(
      Js.parse("""{"a":1,"b":2}"""))
    assert(comma.map(_.asInt()) == Seq(1, 2))

    val objStream = MiniJq.compileAll("""{ "x": .items[] }""")(
      Js.parse("""{"items":[5,6]}"""))
    assert(objStream.map(_.get("x").asInt()) == Seq(5, 6))

    val indexed = MiniJq.compile(""".items[1]""")(
      Js.parse("""{"items":[5,6,7]}"""))
    assert(indexed.asInt() == 6)
  }

  test("JSLT let bindings and if/else") {
    val f = MiniJslt.compile(
      """let threshold = 10
        |{ "big": if (.v > $threshold) "yes" else "no", "v": .v }"""
        .stripMargin)
    assert(f(Js.parse("""{"v":15}""")).get("big").asText() == "yes")
    assert(f(Js.parse("""{"v":5}""")).get("big").asText() == "no")
  }
}

/** JQ builtins + parameterized defs (round 2). */
class MiniJqBuiltinsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJq
  import graft.json.Js

  test("map/select/length/keys/has/add/range/first/type") {
    def one(s: String, in: String) = MiniJq.compile(s)(Js.parse(in))
    assert(Js.render(one("""map(.v * 2)""", """[{"v":1},{"v":2}]""")) == "[2,4]")
    assert(Js.render(one("""[.[] | select(.v > 1)]""",
      """[{"v":1},{"v":2},{"v":3}]""")) == """[{"v":2},{"v":3}]""")
    assert(one("""length""", """"hello"""").asInt() == 5)
    assert(one("""length""", """[1,2,3]""").asInt() == 3)
    assert(Js.render(one("""keys""", """{"b":1,"a":2}""")) == """["a","b"]""")
    assert(one("""has("a")""", """{"a":1}""").asBoolean())
    assert(one("""add""", """[1,2,3]""").asLong() == 6)
    assert(Js.render(one("""[range(3)]""", "null")) == "[0,1,2]")
    assert(one("""first""", """[7,8]""").asInt() == 7)
    assert(one("""type""", """[1]""").asText() == "array")
    assert(one("""tostring""", """{"a":1}""").asText() == """{"a":1}""")
  }

  test("parameterized defs bind args as filters") {
    val f = MiniJq.compile(
      """def scaled(factor): .v * factor;
        |{ "out": scaled(10) }""".stripMargin)
    assert(f(Js.parse("""{"v":4}""")).get("out").asLong() == 40)
    // arg is a FILTER evaluated at use site
    val g = MiniJq.compile(
      """def pick(f): map(f);
        |pick(.x)""".stripMargin)
    assert(Js.render(g(Js.parse("""[{"x":1},{"x":2}]"""))) == "[1,2]")
  }
}

/** JQ string interpolation. */
class MiniJqInterpSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJq
  import graft.json.Js

  test("\\(expr) interpolates; streams multiply outputs") {
    val f = MiniJq.compile("""{ "msg": "user \(.name) has \(.n) items" }""")
    assert(f(Js.parse("""{"name":"jo","n":3}""")).get("msg").asText() ==
      "user jo has 3 items")
    val multi = MiniJq.compileAll(""" "v=\(.items[])" """)
    assert(multi(Js.parse("""{"items":[1,2]}""")).map(_.asText()) ==
      Seq("v=1", "v=2"))
  }
}

/** JSLT builtins. */
class MiniJsltBuiltinsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJslt
  import graft.json.Js

  test("size/string/number/contains/join/case/fallback") {
    def one(s: String, in: String) = MiniJslt.compile(s)(Js.parse(in))
    assert(one("size(.items)", """{"items":[1,2,3]}""").asInt() == 3)
    assert(one("string(.v)", """{"v":5}""").asText() == "5")
    assert(one("number(.v)", """{"v":"42"}""").asLong() == 42)
    assert(one("""contains(2, .items)""", """{"items":[1,2]}""").asBoolean())
    assert(one("""join(.items, "-")""",
      """{"items":["a","b"]}""").asText() == "a-b")
    assert(one("uppercase(.s)", """{"s":"ab"}""").asText() == "AB")
    assert(one("fallback(.missing, .v)", """{"v":7}""").asInt() == 7)
    assert(one("is-array(.items)", """{"items":[]}""").asBoolean())
    assert(!one("boolean(.items)", """{"items":[]}""").asBoolean())
  }
}

/** JQ variables and reduce. */
class MiniJqVarsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJq
  import graft.json.Js

  test("EXPR as $x | ... binds each output") {
    val g = MiniJq.compile(
      """.total as $t | { "shares": [.items[] | .v / $t] }""")
    val out = g(Js.parse("""{"total":10.0,"items":[{"v":2.0},{"v":8.0}]}"""))
    assert(Js.render(out.get("shares")) == "[0.2,0.8]")
  }

  test("reduce folds a stream") {
    val f = MiniJq.compile("""reduce .items[] as $x (0; . + $x.v)""")
    assert(f(Js.parse("""{"items":[{"v":1},{"v":2},{"v":3}]}""")).asLong() == 6)
  }
}

/** JQ // alternative and JSLT for comprehensions. */
class MiniLang2Spec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.{MiniJq, MiniJslt}
  import graft.json.Js

  test("JQ // falls back on null/false/empty") {
    val f = MiniJq.compile(""".a // "dflt"""")
    assert(f(Js.parse("""{"a":"x"}""")).asText() == "x")
    assert(f(Js.parse("""{"b":1}""")).asText() == "dflt")
    assert(f(Js.parse("""{"a":false}""")).asText() == "dflt")
    val g = MiniJq.compile("""(.items[] | select(. > 5)) // -1""")
    assert(g(Js.parse("""{"items":[1,2]}""")).asInt() == -1)
    assert(g(Js.parse("""{"items":[9,1]}""")).asInt() == 9)
  }

  test("JSLT for comprehensions over arrays and objects") {
    val arr = MiniJslt.compile("""[for (.items) .v * 2 if (.v > 1)]""")
    assert(Js.render(arr(Js.parse(
      """{"items":[{"v":1},{"v":2},{"v":3}]}"""))) == "[4,6]")
    val obj = MiniJslt.compile("""{for (.pairs) .k : .n}""")
    val o = obj(Js.parse("""{"pairs":[{"k":"a","n":1},{"k":"b","n":2}]}"""))
    assert(o.get("a").asInt() == 1 && o.get("b").asInt() == 2)
    // object source yields {key, value} contexts
    val inv = MiniJslt.compile("""{for (.m) .value : .key}""")
    val r = inv(Js.parse("""{"m":{"x":"1","y":"2"}}"""))
    assert(r.get("1").asText() == "x" && r.get("2").asText() == "y")
    val lit = MiniJslt.compile("""[.a, .b]""")
    assert(Js.render(lit(Js.parse("""{"a":1,"b":2}"""))) == "[1,2]")
  }
}

/** Regex/string builtins in both interpreters. */
class MiniLangRegexSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.{MiniJq, MiniJslt}
  import graft.json.Js

  test("JQ test/capture/sub/gsub/split/join/affixes") {
    def one(s: String, in: String) = MiniJq.compile(s)(Js.parse(in))
    assert(one(""".s | test("\\d+")""", """{"s":"a12b"}""").asBoolean())
    assert(one(""".s | capture("(?<num>\\d+)") | .num""",
      """{"s":"a12b"}""").asText() == "12")
    assert(one(""".s | sub("a"; "X")""", """{"s":"aba"}""").asText() == "Xba")
    assert(one(""".s | gsub("a"; "X")""", """{"s":"aba"}""").asText() == "XbX")
    assert(Js.render(one(""".s | split(",")""",
      """{"s":"a,b"}""")) == """["a","b"]""")
    assert(one(""".items | join("-")""",
      """{"items":["a","b"]}""").asText() == "a-b")
    assert(one(""".s | ltrimstr("ab")""", """{"s":"abc"}""").asText() == "c")
    assert(one(""".s | startswith("ab")""", """{"s":"abc"}""").asBoolean())
    assert(one(""".s | ascii_upcase""", """{"s":"ab"}""").asText() == "AB")
  }

  test("JSLT test/capture/replace/split/trim") {
    def one(s: String, in: String) = MiniJslt.compile(s)(Js.parse(in))
    assert(one("""test(.s, "\\d")""", """{"s":"a1"}""").asBoolean())
    assert(one("""capture(.s, "(?<w>[a-z]+)") | .w""",
      """{"s":"hi99"}""").asText() == "hi")
    assert(one("""replace(.s, "a", "o")""", """{"s":"banana"}""").asText() == "bonono")
    assert(Js.render(one("""split(.s, "-")""", """{"s":"x-y"}""")) == """["x","y"]""")
    assert(one("""trim(.s)""", """{"s":" x "}""").asText() == "x")
  }
}

/** Regression coverage for the second review round. */
class MiniJqReview2Spec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJq
  import graft.json.Js

  test("// works inside object values; literal replacements; range(a;b)") {
    val f = MiniJq.compile("""{ "a": .x // 1, "b": .y // "d" }""")
    val o = f(Js.parse("""{"y":"v"}"""))
    assert(o.get("a").asInt() == 1 && o.get("b").asText() == "v")
    assert(MiniJq.compile(""".s | gsub("-"; "$")""")(
      Js.parse("""{"s":"a-b"}""")).asText() == "a$b")
    assert(Js.render(MiniJq.compile("""[range(2;5)]""")(
      Js.parse("null"))) == "[2,3,4]")
    // reduce keeps the LAST output of a multi-output update
    assert(MiniJq.compile("""reduce .[] as $x (0; . + $x, . * 2)""")(
      Js.parse("[1,2]")).asLong() == 0) // ((0*2)*2): last output each step
  }
}

/** JQ try/?, foreach. */
class MiniJqTrySpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.jq.MiniJq
  import graft.json.Js

  test("try suppresses errors, catch handles, ? is shorthand") {
    assert(MiniJq.compileAll(""" try (.s | tonumber) """)(
      Js.parse("""{"s":"abc"}""")).isEmpty)
    assert(MiniJq.compile(""" try (.s | tonumber) catch "bad" """)(
      Js.parse("""{"s":"abc"}""")).asText() == "bad")
    assert(MiniJq.compile(""" (.s | tonumber)? // -1 """)(
      Js.parse("""{"s":"abc"}""")).asInt() == -1)
    assert(MiniJq.compile(""" (.s | tonumber)? // -1 """)(
      Js.parse("""{"s":"7"}""")).asInt() == 7)
  }

  test("foreach emits running states") {
    assert(Js.render(MiniJq.compile("""[foreach .[] as $x (0; . + $x)]""")(
      Js.parse("[1,2,3]"))) == "[1,3,6]")
    assert(Js.render(MiniJq.compile(
      """[foreach .[] as $x (0; . + $x; . * 10)]""")(
      Js.parse("[1,2]"))) == "[10,30]")
  }
}
