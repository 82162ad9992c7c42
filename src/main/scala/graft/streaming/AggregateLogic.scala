package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import io.fabric8.zjsonpatch.{JsonDiff, JsonPatch}
import graft.json.Js
import scala.jdk.CollectionConverters._

/** Pure event-sourcing reducer logic for the aggregate part
  * (docs/state.md:44-127, App.java:605-644 in the reference): command →
  * [ACL check] → [_seq check] → [validate] → reduce → diff → events.
  *
  * Pure JVM code on Jackson nodes: the surrounding Spark operator
  * (AggregatePart) shards by `_id` via groupByKey/flatMapGroupsWithState;
  * per-key sequential reduction is inherently imperative, exactly like the
  * reference's per-key processor chain.
  */
object AggregateLogic {

  sealed trait Dest { def name: String }
  case object Aggregate extends Dest { val name = "aggregate" }
  case object Event extends Dest { val name = "event" }
  case object EventFull extends Dest { val name = "event-full" }
  case object Reply extends Dest { val name = "reply" }

  final case class Config(
      appName: String,
      aggType: String,
      validators: Map[String, JsonNode] = Map.empty,
      reducers: Map[String, (ObjectNode, ObjectNode) => ObjectNode] = Map.empty)

  private val Technical =
    Set("_id", "_type", "_seq", "_corr", "_jwt", "_command", "_languages",
      "_timestamp", "_error", "errors")

  /** Process one command against the current snapshot. Returns the new
    * snapshot (unchanged if ignored/invalid) and the messages to emit,
    * tagged by destination stream.
    */
  def step(state: Option[ObjectNode], command: ObjectNode, conf: Config,
      nowMillis: Long): (Option[ObjectNode], Seq[(Dest, ObjectNode)]) = {
    val cmdName = text(command, "_command").getOrElse("")
    val id = text(command, "_id").getOrElse("")
    val cur = state.getOrElse {
      val o = Js.obj()
      o.put("_id", id)
      o.put("_type", fullType(conf))
      o.put("_seq", -1L)
      o
    }

    // 1. authentication + ACL (docs/state.md "Access Control"): a command
    //    without _jwt, or whose _jwt.roles don't intersect the state's
    //    _acl entry, is refused with a 403 reply (reference fixture
    //    app35/test/topics/to/plusminus2-counter-reply/3_error.json).
    if (!command.has("_jwt") || !aclAllows(cur, command, cmdName)) {
      val refused = command.deepCopy[ObjectNode]()
      refused.put("_error", true)
      refused.put("_statusCode", 403)
      refused.put("message", "Forbidden")
      return (state, Seq(Reply -> refused))
    }

    // 2. optimistic _seq check (docs/state.md:92): stale commands ignored
    val curSeq = long(cur, "_seq").getOrElse(-1L)
    long(command, "_seq") match {
      case Some(s) if s != curSeq => return (state, Nil)
      case _                      =>
    }

    // 3. validation: failures annotate the command → reply only
    conf.validators.get(cmdName).foreach { validator =>
      val errors = JsonValidator.validate(validator, command, Some(cur))
      if (!errors.isEmpty) {
        val annotated = command.deepCopy[ObjectNode]()
        annotated.put("_error", true)
        annotated.set[JsonNode]("errors", errors)
        return (state, Seq(Reply -> annotated))
      }
    }

    // 4. reduce
    val reducer = conf.reducers.getOrElse(cmdName, builtin(cmdName))
    val reduced = reducer(command, cur)

    // 5. restore technical discipline on the new state
    val newState = reduced.deepCopy[ObjectNode]()
    newState.put("_id", id)
    newState.put("_type", fullType(conf))
    text(command, "_corr").foreach(newState.put("_corr", _))
    Option(command.get("_jwt")).foreach(newState.set[JsonNode]("_jwt", _))

    // no change → nothing (docs/state.md:99)
    if (stripVolatile(newState) == stripVolatile(cur)) return (state, Nil)

    val newSeq = curSeq + 1
    newState.put("_seq", newSeq)

    // 6. event = RFC-6902 diff of business fields (zjsonpatch, the same
    //    diff family the reference uses via javax.json Json.createDiff)
    val ops = JsonDiff.asJson(stripVolatile(cur), stripVolatile(newState))
    val event = Js.obj()
    event.put("_id", id)
    event.put("_type", fullType(conf))
    event.put("_command", cmdName)
    event.put("_seq", newSeq)
    event.put("_timestamp", nowMillis)
    text(command, "_corr").foreach(event.put("_corr", _))
    Option(command.get("_jwt")).foreach(event.set[JsonNode]("_jwt", _))
    event.set[JsonNode]("_ops", ops)
    val eventFull = event.deepCopy[ObjectNode]()
    eventFull.set[JsonNode]("_before", cur)
    eventFull.set[JsonNode]("_after", newState)

    (Some(newState),
      Seq(Aggregate -> newState, Event -> event, EventFull -> eventFull,
        Reply -> newState))
  }

  /** Built-in put/patch/delete reducers (docs/state.md:95). */
  private def builtin(cmd: String): (ObjectNode, ObjectNode) => ObjectNode =
    cmd match {
      case "put" => (command, _) => {
        val next = Js.obj()
        Js.fields(command).foreach { case (k, v) =>
          if (!Technical.contains(k) && k != "_ops") next.set[JsonNode](k, v)
        }
        next
      }
      case "patch" => (command, state) => {
        val ops = Option(command.get("_ops")).getOrElse(Js.arr())
        JsonPatch.apply(ops, stripVolatile(state)) match {
          case o: ObjectNode => o
          case other => throw new IllegalStateException(s"patch → $other")
        }
      }
      case "delete" => (_, state) => {
        val next = state.deepCopy[ObjectNode]()
        next.put("_deleted", true)
        next
      }
      case other => (_, state) => state // unknown command: no-op
    }

  /** Comparison/diff ignore the envelope that changes on every command. */
  private def stripVolatile(o: ObjectNode): ObjectNode = {
    val c = o.deepCopy[ObjectNode]()
    Seq("_corr", "_jwt", "_seq", "_timestamp").foreach(c.remove)
    c
  }

  private def aclAllows(state: ObjectNode, command: ObjectNode,
      cmdName: String): Boolean = {
    val acl = Option(state.get("_acl")).filter(_.isObject)
    val jwtSub = Option(command.get("_jwt")).flatMap(j => text(j, "sub"))
    if (jwtSub.contains("system")) return true
    acl match {
      case None => true
      case Some(a) =>
        Option(a.get(cmdName)).orElse(Option(a.get("write"))) match {
          case None => true
          case Some(allowed: ArrayNode) =>
            val roles = Option(command.get("_jwt"))
              .flatMap(j => Option(j.get("roles")))
              .map(r => r.elements().asScala.map(_.asText()).toSet)
              .getOrElse(Set.empty)
            allowed.elements().asScala.exists(r => roles.contains(r.asText()))
          case Some(_) => true
        }
    }
  }

  private def fullType(conf: Config) = conf.aggType

  private def text(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(_.isTextual).map(_.asText())
  private def long(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filter(_.isNumber).map(_.asLong())
}
