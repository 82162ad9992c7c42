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
      reducers: Map[String, (ObjectNode, ObjectNode) => ObjectNode] = Map.empty,
      /** href → referenced aggregate state (JSON), for `{href: "/app/type/
        * id"}` subobject resolution (reference app36; pincette-jes resolves
        * against the aggregate collection). The id is the href's last path
        * segment.
        */
      resolver: String => Option[String] = _ => None)

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

    // delete of an instance that never existed: nothing to tombstone —
    // refuse with a reply instead of fabricating `{_deleted: true}` state
    // at _seq 0 for a phantom id (which would occupy the store forever
    // and emit a delete event no put ever preceded)
    if (cmdName == "delete" && state.isEmpty) {
      val refused = command.deepCopy[ObjectNode]()
      refused.put("_error", true)
      refused.put("_statusCode", 404)
      refused.put("message", "Not found")
      return (state, Seq(Reply -> refused))
    }

    // 4. reduce — the reducer sees the state with `{href}` subobjects
    //    resolved to the referenced aggregate's fields; the STORED state
    //    keeps the bare refs (unresolve below), so events diff clean
    //    (reference app36: _ops shows only /value, hrefs stay hrefs).
    //    A reducer that THROWS (bad patch ops, a custom reducer bug) must
    //    answer with an error reply, not kill the query: the streaming
    //    checkpoint would replay the same poison command forever.
    val reducer = conf.reducers.getOrElse(cmdName, builtin(cmdName))
    val resolvedCur = resolveHrefs(cur, conf.resolver)
    val reduced0 =
      try reducer(command, resolvedCur)
      catch {
        case e: Exception =>
          val refused = command.deepCopy[ObjectNode]()
          refused.put("_error", true)
          refused.put("_statusCode", 400)
          refused.put("message",
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          return (state, Seq(Reply -> refused))
      }
    val reduced = unresolve(cur, resolvedCur, reduced0) match {
      case o: ObjectNode => o
      case _             => reduced0
    }

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
    //    diff family the reference uses via javax.json Json.createDiff;
    //    ops reordered to document field order — zjsonpatch sorts keys,
    //    the reference differ follows the target's order)
    val ops = orderedDiff(stripVolatile(cur), stripVolatile(newState))
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

  /** RFC-6902 ops sorted by the top-level field's position in the target
    * (falling back to the source for removals), stable within a field.
    */
  private def orderedDiff(src: ObjectNode, tgt: ObjectNode): JsonNode = {
    val ops = JsonDiff.asJson(src, tgt)
    val tgtOrder = Js.fields(tgt).map(_._1).zipWithIndex.toMap
    val srcOrder = Js.fields(src).map(_._1).zipWithIndex.toMap
    val sorted = Js.elems(ops).sortBy { op =>
      // RFC 6901 unescape (~1 before ~0): a field named "a/b" or "a~b"
      // must still find its document-order slot
      val seg = op.get("path").asText().split("/")
        .drop(1).headOption.getOrElse("")
        .replace("~1", "/").replace("~0", "~")
      tgtOrder.get(seg)
        .orElse(srcOrder.get(seg).map(_ + tgtOrder.size))
        .getOrElse(Int.MaxValue)
    }
    val out = Js.arr()
    sorted.foreach(out.add)
    out
  }

  /** Single-hop href resolution: an object carrying `href` gains the
    * referenced aggregate's fields (href kept) so reducers can navigate
    * `.ref.value` paths. Arrays recurse; unresolvable refs stay bare.
    */
  private def resolveHrefs(state: ObjectNode,
      resolver: String => Option[String]): ObjectNode = {
    def walk(n: JsonNode): JsonNode = n match {
      case o: ObjectNode =>
        val out = Js.obj()
        Js.fields(o).foreach { case (k, v) => out.set[JsonNode](k, walk(v)) }
        Option(o.get("href")).filter(_.isTextual)
          .map(h => h.asText().split("/").last)
          .flatMap(resolver)
          .foreach { refJson =>
            Js.fields(Js.parse(refJson)).foreach { case (k, v) =>
              if (k != "href" && !out.has(k)) out.set[JsonNode](k, v)
            }
          }
        out
      case a: ArrayNode =>
        val out = Js.arr()
        Js.elems(a).foreach(e => out.add(walk(e)))
        out
      case other => other
    }
    walk(state).asInstanceOf[ObjectNode]
  }

  /** Collapse resolved refs back — resolution must not leak into the
    * stored state. The walk runs over (stored, resolved-view, reduced) in
    * parallel: a key the reducer emits that is ABSENT from the stored
    * state, carried UNCHANGED from the resolved view, inside an object
    * that has an `href`, is exactly a resolver-injected field — drop it.
    * Everything else (keys present in the stored state, keys the reducer
    * added, injected values the reducer MODIFIED — a deliberate write)
    * stays. Matching on value identity rather than `o.size() == 1` also
    * covers href objects with sibling fields and reducers that swap the
    * href itself.
    */
  private def unresolve(orig: JsonNode, resolved: JsonNode,
      red: JsonNode): JsonNode =
    (orig, resolved, red) match {
      case (o: ObjectNode, rs: ObjectNode, r: ObjectNode) =>
        val out = Js.obj()
        Js.fields(r).foreach { case (k, v) =>
          if (o.has(k))
            out.set[JsonNode](k,
              unresolve(o.get(k), Option(rs.get(k)).getOrElse(o.get(k)), v))
          else {
            val injected = o.has("href") && rs.has(k) && rs.get(k) == v
            if (!injected) out.set[JsonNode](k, v)
          }
        }
        out
      case (o: ArrayNode, rs: ArrayNode, r: ArrayNode)
          if o.size() == r.size() && rs.size() == r.size() =>
        val out = Js.arr()
        (0 until r.size()).foreach(i =>
          out.add(unresolve(o.get(i), rs.get(i), r.get(i))))
        out
      case _ => red
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

  /** Jackson-style lenient extraction (the reference reads these fields
    * with `asText`/`asLong`, which coerce): a numeric `_id` stringifies —
    * matching the Spark-side key (`get_json_object` stringifies too) —
    * and a string `"_seq"` still engages the optimistic-lock check
    * instead of silently bypassing it.
    */
  private def text(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(v => v.isValueNode && !v.isNull).map(_.asText())
  private def long(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).flatMap {
      case v if v.isNumber  => Some(v.asLong())
      case v if v.isTextual =>
        scala.util.Try(v.asText().trim.toLong).toOption
      case _ => None
    }
}
