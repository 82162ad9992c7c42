package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import graft.json.Js
import scala.jdk.CollectionConverters._

/** Application build pass (reference Common.build, Parameters.java,
  * docs/parameters.md): resolve the top-level `parameters` object —
  * including `config:` / `config-json:` injection and the special `ENV` —
  * then substitute `${NAME}`, `${prefix:NAME:suffix}` and `${PARAM.field}`
  * references throughout the spec. Non-string parameters must constitute
  * the whole field value; missing parameters become empty strings;
  * parameter values may reference other parameters.
  */
object Parameters {

  private val Ref = """\$\{([^}]*)\}""".r

  /** Full build pass (reference Build.java, docs/application.md): resolve
    * the parameters, then expand file includes — array elements that are
    * `"<file>.yml"` strings, or `{include: {file, parameters}}` objects
    * anywhere — relative to the including file's directory. An included
    * array splices into the surrounding array; include-level parameters
    * (themselves substituted in the outer scope) override the outer scope
    * inside the included file.
    */
  def build(spec: JsonNode, config: Map[String, String],
      load: String => String): JsonNode = {
    val params = paramsOf(spec, config)
    val out = expand(spec, params, "", load)
    out match {
      case o: ObjectNode => o.remove("parameters"); o
      case other         => other
    }
  }

  private def isFileRef(s: String): Boolean =
    s.endsWith(".yml") || s.endsWith(".yaml") || s.endsWith(".json")

  private def included(e: JsonNode, params: Map[String, JsonNode],
      base: String, load: String => String, inArray: Boolean)
      : Option[JsonNode] =
    if (inArray && e.isTextual && isFileRef(e.asText())) {
      val path = substituteString(e.asText(), params).asText()
      val full = Js.relativeTo(base, path)
      Some(expand(Js.parseYaml(load(full)), params, full, load))
    } else if (e.isObject && e.size() == 1 && e.has("include")) {
      val inc = e.get("include")
      val extra = Option(inc.get("parameters")).map(p =>
        Js.fields(p).map { case (k, v) => k -> substitute(v, params) }.toMap)
        .getOrElse(Map.empty[String, JsonNode])
      val merged = params ++ extra
      val path = substituteString(inc.get("file").asText(), merged).asText()
      val full = Js.relativeTo(base, path)
      Some(expand(Js.parseYaml(load(full)), merged, full, load))
    } else None

  private def expand(n: JsonNode, params: Map[String, JsonNode],
      base: String, load: String => String): JsonNode = n match {
    case t if t.isTextual => substituteString(t.asText(), params)
    case a: ArrayNode =>
      val out = Js.arr()
      Js.elems(a).foreach { e =>
        included(e, params, base, load, inArray = true) match {
          case Some(arr: ArrayNode) => Js.elems(arr).foreach(out.add)
          case Some(x)              => out.add(x)
          case None                 => out.add(expand(e, params, base, load))
        }
      }
      out
    case o: ObjectNode =>
      included(o, params, base, load, inArray = false).getOrElse {
        val out = Js.obj()
        Js.fields(o).foreach { case (k, v) =>
          out.set[JsonNode](k, expand(v, params, base, load))
        }
        out
      }
    case other => other
  }

  private def paramsOf(spec: JsonNode, config: Map[String, String])
      : Map[String, JsonNode] = {
    val raw = Option(spec.get("parameters"))
      .map(p => Js.fields(p).toMap).getOrElse(Map.empty)
    val withEnv = config.get("environment") match {
      case Some(env) if !raw.contains("ENV") =>
        raw + ("ENV" -> TextNode.valueOf(env))
      case _ => raw
    }
    // config injection + parameter-in-parameter resolution (fixpoint)
    var params: Map[String, JsonNode] = withEnv.map {
      case (k, v) if v.isTextual && v.asText().startsWith("config:") =>
        k -> TextNode.valueOf(
          config.getOrElse(v.asText().stripPrefix("config:"), ""))
      case (k, v) if v.isTextual && v.asText().startsWith("config-json:") =>
        k -> Js.parse(
          config.getOrElse(v.asText().stripPrefix("config-json:"), "null"))
      case kv => kv
    }
    (0 until 5).foreach { _ =>
      params = params.map { case (k, v) => k -> substitute(v, params) }
    }
    params
  }

  /** Substitution-only pass (no file includes — use `build` for those). */
  def resolve(spec: JsonNode, config: Map[String, String] = Map.empty)
      : JsonNode = {
    val out = substitute(spec, paramsOf(spec, config))
    out match {
      case o: ObjectNode => o.remove("parameters"); o
      case other         => other
    }
  }

  private def substitute(n: JsonNode, params: Map[String, JsonNode])
      : JsonNode = n match {
    case t if t.isTextual => substituteString(t.asText(), params)
    case o: ObjectNode =>
      val out = Js.obj()
      Js.fields(o).foreach { case (k, v) =>
        out.set[JsonNode](k, substitute(v, params))
      }
      out
    case a: ArrayNode =>
      val out = Js.arr()
      Js.elems(a).foreach(e => out.add(substitute(e, params)))
      out
    case other => other
  }

  private def lookup(name: String, params: Map[String, JsonNode])
      : Option[JsonNode] = {
    val parts = name.split("\\.")
    params.get(parts.head).flatMap(base =>
      parts.tail.foldLeft(Option(base))((cur, f) =>
        cur.flatMap(c => Option(c.get(f)))))
  }

  private def substituteString(s: String, params: Map[String, JsonNode])
      : JsonNode = {
    // whole-value reference → may substitute a non-string JSON value
    Ref.findFirstMatchIn(s) match {
      case Some(m) if m.start == 0 && m.end == s.length &&
          !m.group(1).contains(":") =>
        lookup(m.group(1), params) match {
          case Some(v) if !v.isTextual => return v
          case Some(v)                 => return v
          case None                    => return TextNode.valueOf("")
        }
      case _ =>
    }
    // embedded references: string-valued params only;
    // ${prefix:NAME:suffix} keeps prefix/suffix only when the param exists
    val replaced = Ref.replaceAllIn(s, m => {
      val body = m.group(1)
      val (prefix, name, suffix) =
        if (body.contains(":")) {
          val parts = body.split(":", -1)
          if (parts.length == 3) (parts(0), parts(1), parts(2))
          else if (parts.length == 2) (parts(0), parts(1), "")
          else ("", body, "")
        } else ("", body, "")
      val value = lookup(name, params).collect {
        case v if v.isTextual => v.asText()
        case v if v.isNumber || v.isBoolean => v.asText()
      }
      java.util.regex.Matcher.quoteReplacement(
        value.map(v => s"$prefix$v$suffix").getOrElse(""))
    })
    TextNode.valueOf(replaced)
  }
}
