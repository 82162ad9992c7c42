package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.TextNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.{Ctx, ExprCompiler}
import graft.op.Env
import graft.plugin.GraftPlugin

/** Classpath plugin for PluginSpec, discovered through
  * META-INF/services/graft.plugin.GraftPlugin — one extension of each kind
  * the reference's plugin interface exposes (docs/plugins.md).
  */
final class TestPlugin extends GraftPlugin {

  override def stageExtensions
      : Map[String, (JsonNode, Env) => DataFrame => DataFrame] =
    Map("$tag" -> ((spec, _) => df =>
      df.withColumn(spec.get("field").asText(),
        lit(spec.get("value").asText()))))

  override def expressionExtensions: Map[String, (JsonNode, Ctx) => Column] =
    Map("$double" -> ((n, ctx) => ExprCompiler.compile(n, ctx) * 2))

  override def matchExtensions
      : Map[String, (Column, JsonNode, Ctx) => Column] =
    Map("$isEven" -> ((target, v, _) =>
      if (v.asBoolean()) target % 2 === 0 else target % 2 =!= 0))

  override def jsltFunctions: Map[String, Seq[JsonNode] => JsonNode] =
    Map("shout" -> (args => TextNode.valueOf(args.head.asText().toUpperCase + "!")))
}

/** Second provider, NOT in the classpath services file — only reachable
  * through a plugin-directory jar's service entry (PluginSpec builds one),
  * proving `Plugins.loadDirectory` discovers via the jar, not the parent.
  */
final class TestDirPlugin extends GraftPlugin {
  override def stageExtensions
      : Map[String, (JsonNode, Env) => DataFrame => DataFrame] =
    Map("$dirTag" -> ((spec, _) => df =>
      df.withColumn("dir", lit(spec.asText()))))
}
