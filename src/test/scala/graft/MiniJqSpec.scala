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

  test("string concat and array construction") {
    val f = MiniJq.compile("""{ "s": .a + "-" + .b, "l": [.a, .b, 3] }""")
    val out = f(Js.parse("""{"a":"x","b":"y"}"""))
    assert(out.get("s").asText() == "x-y")
    assert(out.get("l").size() == 3)
  }
}
