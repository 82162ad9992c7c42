package graft.json

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.fasterxml.jackson.dataformat.yaml.YAMLMapper
import scala.jdk.CollectionConverters._

/** Thin Jackson facade: the pipeline language (MongoDB aggregation dialect,
  * see /root/reference/docs/aggregation_stages.md) is specified as JSON/YAML
  * documents; we compile from the Jackson AST.
  */
object Js {
  private val json = new ObjectMapper()
  private val yaml = new YAMLMapper()

  def parse(s: String): JsonNode = json.readTree(s)
  def parseYaml(s: String): JsonNode = yaml.readTree(s)
  def obj(): ObjectNode = json.createObjectNode()
  def arr(): ArrayNode = json.createArrayNode()
  def str(n: JsonNode): String = n.asText()

  def fields(n: JsonNode): Seq[(String, JsonNode)] =
    n.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)

  def elems(n: JsonNode): Seq[JsonNode] = n.elements().asScala.toSeq

  def mkArr(items: Seq[JsonNode]): ArrayNode = {
    val a = arr()
    items.foreach(a.add)
    a
  }

  /** Single-key object whose key starts with `$` → (op, args). Keys
    * starting with `_` are metadata siblings (the reference allows e.g.
    * `_trace: true` next to the stage op, app1/application.yaml) and are
    * ignored for operator detection.
    */
  def asOp(n: JsonNode): Option[(String, JsonNode)] =
    if (!n.isObject) None
    else fields(n).filterNot(_._1.startsWith("_")) match {
      case Seq((k, v)) if k.startsWith("$") => Some(k -> v)
      case _                                => None
    }

  /** Resolve `ref` relative to the directory of the file `cur` (both are
    * app-root-relative paths; `cur` empty = app root).
    */
  def relativeTo(cur: String, ref: String): String = {
    val parent = Option(java.nio.file.Paths.get(cur).getParent)
    parent.map(_.resolve(ref)).getOrElse(java.nio.file.Paths.get(ref))
      .normalize().toString
  }

  def render(n: JsonNode): String = json.writeValueAsString(n)
}
