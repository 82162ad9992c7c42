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

  /** Single-key object whose key starts with `$` → (op, args). */
  def asOp(n: JsonNode): Option[(String, JsonNode)] =
    if (n.isObject && n.size() == 1) {
      val k = n.fieldNames().next()
      if (k.startsWith("$")) Some(k -> n.get(k)) else None
    } else None

  def render(n: JsonNode): String = json.writeValueAsString(n)
}
