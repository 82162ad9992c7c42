package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.json.Js
import graft.streaming.AggregateLogic
import graft.streaming.AggregateLogic._

/** Pure unit tests of the event-sourcing reducer semantics
  * (docs/state.md:44-127): put/patch/delete built-ins, _seq discipline,
  * RFC-6902 event diffs, validator annotation, ACL.
  */
class AggregateLogicSpec extends AnyFunSuite {

  private val conf = Config(appName = "app", aggType = "app-counter")

  private def obj(json: String): ObjectNode =
    Js.parse(json).asInstanceOf[ObjectNode]

  test("put creates state with _seq 0 and emits 4 outputs") {
    val (state, out) = AggregateLogic.step(None,
      obj("""{"_id":"a","_type":"app-counter","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""),
      conf, 1000L)
    assert(state.isDefined)
    val s = state.get
    assert(s.get("_seq").asLong() == 0)
    assert(s.get("value").asInt() == 1)
    assert(s.get("_corr").asText() == "c1")
    assert(out.map(_._1.name).sorted ==
      Seq("aggregate", "event", "event-full", "reply"))
    val event = out.collectFirst { case (Event, e) => e }.get
    assert(event.get("_seq").asLong() == 0)
    assert(event.get("_command").asText() == "put")
    assert(event.get("_ops").isArray && event.get("_ops").size() > 0)
    val full = out.collectFirst { case (EventFull, e) => e }.get
    assert(full.has("_before") && full.has("_after"))
    assert(full.get("_after").get("value").asInt() == 1)
  }

  test("identical put produces no outputs and no state change") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","_corr":"c2","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    assert(out.isEmpty)
    assert(s2.get.get("_seq").asLong() == 0)
  }

  test("patch applies RFC-6902 ops and increments _seq") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"patch","_corr":"c2",
             "_ops":[{"op":"replace","path":"/value","value":5}],"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(s2.get.get("value").asInt() == 5)
    assert(s2.get.get("_seq").asLong() == 1)
    val event = out.collectFirst { case (Event, e) => e }.get
    assert(event.get("_seq").asLong() == 1)
  }

  test("delete marks _deleted") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    val (s2, _) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"delete","_corr":"c2","_jwt":{"sub":"system"}}"""), conf, 0L)
    assert(s2.get.get("_deleted").asBoolean())
  }

  test("stale _seq command is ignored") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","_corr":"c2","_seq":99,"value":2,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(out.isEmpty)
    assert(s2.get.get("value").asInt() == 1)
    // matching _seq is accepted
    val (s3, _) = AggregateLogic.step(s2,
      obj("""{"_id":"a","_command":"put","_corr":"c3","_seq":0,"value":2,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(s3.get.get("value").asInt() == 2)
  }

  test("validator failure annotates command onto reply only") {
    val v = Js.parse(
      """{"conditions":[{"value":{"$exists":true},"$code":"REQUIRED"}]}""")
    val c = conf.copy(validators = Map("put" -> v))
    val (state, out) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","other":2,"_jwt":{"sub":"system"}}"""), c, 0L)
    assert(state.isEmpty)
    assert(out.map(_._1) == Seq(Reply))
    val reply = out.head._2
    assert(reply.get("_error").asBoolean())
    assert(reply.get("errors").get(0).get("code").asText() == "REQUIRED")
  }

  test("ACL denies without matching role, allows system sub") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,
             "_acl":{"put":["admin"]},"_jwt":{"sub":"system"}}"""), conf, 0L)
    assert(s1.get.get("_acl") != null)
    val (s2, out2) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","_corr":"c2","value":2,
             "_jwt":{"sub":"u1","roles":["user"]}}"""), conf, 0L)
    // denied → 403 Forbidden reply, state unchanged (reference app35)
    assert(s2.get.get("value").asInt() == 1)
    assert(out2.map(_._1) == Seq(AggregateLogic.Reply))
    assert(out2.head._2.get("_statusCode").asInt() == 403)
    val (s3, out3) = AggregateLogic.step(s2,
      obj("""{"_id":"a","_command":"put","_corr":"c3","value":3,
             "_jwt":{"sub":"u2","roles":["admin"]}}"""), conf, 0L)
    assert(s3.get.get("value").asInt() == 3 && out3.nonEmpty)
    val (s4, out4) = AggregateLogic.step(s3,
      obj("""{"_id":"a","_command":"put","_corr":"c4","value":4,
             "_jwt":{"sub":"system"}}"""), conf, 0L)
    assert(s4.get.get("value").asInt() == 4 && out4.nonEmpty)
  }

  test("a patch with bad ops answers an error reply, never throws") {
    // a thrown reducer is a poison pill: the streaming checkpoint would
    // replay the same command forever
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"patch","_corr":"c2",
             "_ops":[{"op":"replace","path":"/nope","value":5}],"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(s2 == s1, "state must be untouched by a failed patch")
    assert(out.map(_._1) == Seq(Reply))
    val reply = out.head._2
    assert(reply.get("_error").asBoolean())
    assert(reply.get("_statusCode").asInt() == 400)
  }

  test("a custom reducer that throws answers an error reply") {
    val boom = conf.copy(reducers = Map(
      "explode" -> ((_, _) => throw new RuntimeException("kaboom"))))
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), boom, 0L)
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"explode","_corr":"c2","_jwt":{"sub":"system"}}"""),
      boom, 0L)
    assert(s2 == s1)
    assert(out.map(_._1) == Seq(Reply))
    assert(out.head._2.get("message").asText() == "kaboom")
  }

  test("delete of a never-existing instance replies 404, no tombstone") {
    val (s, out) = AggregateLogic.step(None,
      obj("""{"_id":"ghost","_command":"delete","_corr":"c1","_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(s.isEmpty, "no phantom state may be created")
    assert(out.map(_._1) == Seq(Reply))
    assert(out.head._2.get("_statusCode").asInt() == 404)
  }

  test("a string _seq still engages the optimistic-lock check") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1","value":1,"_jwt":{"sub":"system"}}"""), conf, 0L)
    // stale _seq as a STRING (form/query-param encoders do this): must be
    // coerced and REJECTED, not treated as absent and applied
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","_seq":"-1","value":9,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(out.isEmpty && s2 == s1, "stale string _seq must be ignored")
    // and a MATCHING string _seq passes
    val (s3, out3) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","_seq":"0","value":9,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(out3.nonEmpty && s3.get.get("value").asInt() == 9)
  }

  test("a numeric _id stringifies instead of storing _id:\"\"") {
    val (s, _) = AggregateLogic.step(None,
      obj("""{"_id":42,"_command":"put","value":1,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    assert(s.get.get("_id").asText() == "42")
  }

  test("href resolution never leaks when the ref object has siblings") {
    val resolving = conf.copy(resolver =
      id => if (id == "1") Some("""{"_id":"1","balance":42}""") else None)
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","_corr":"c1",
             "owner":{"href":"/app/t/1","note":"n"},"value":1,"_jwt":{"sub":"system"}}"""),
      resolving, 0L)
    // patch touches ONLY /value; the stored state must keep the bare ref
    // (plus its sibling), never the resolver-injected balance/_id
    val (s2, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"patch","_corr":"c2",
             "_ops":[{"op":"replace","path":"/value","value":2}],"_jwt":{"sub":"system"}}"""),
      resolving, 0L)
    val owner = s2.get.get("owner")
    assert(Js.fields(owner).map(_._1).toSet == Set("href", "note"),
      Js.render(owner))
    // and the event diff mentions only /value
    val event = out.collectFirst { case (Event, e) => e }.get
    val paths = Js.elems(event.get("_ops")).map(_.get("path").asText())
    assert(paths == Seq("/value"), paths.toString)
  }

  test("diff ops on fields containing '/' or '~' keep document order") {
    val (s1, _) = AggregateLogic.step(None,
      obj("""{"_id":"a","_command":"put","a/b":1,"z":1,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    val (_, out) = AggregateLogic.step(s1,
      obj("""{"_id":"a","_command":"put","a/b":2,"z":2,"_jwt":{"sub":"system"}}"""),
      conf, 0L)
    val event = out.collectFirst { case (Event, e) => e }.get
    val paths = Js.elems(event.get("_ops")).map(_.get("path").asText())
    // document order: the escaped a/b field (path /a~1b) sorts BEFORE /z,
    // which requires unescaping the pointer segment to find its slot
    assert(paths == Seq("/a~1b", "/z"), paths.toString)
  }
}
