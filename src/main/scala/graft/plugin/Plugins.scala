package graft.plugin

import java.nio.file.{Files, Path}
import java.util.ServiceLoader
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import graft.expr.Ctx
import graft.op.Env

/** Extension contract mirroring the reference's plugin interface
  * (docs/plugins.md; Plugins.java:25-74;
  * net.pincette.json.streams.plugin.Plugin): custom pipeline stages,
  * expression operators, `$match` query operators, and JSLT functions.
  *
  * Implementations are discovered with `java.util.ServiceLoader` via
  * `META-INF/services/graft.plugin.GraftPlugin` — on the classpath (Spark:
  * ship the plugin jar with `--jars`, which also puts it on every
  * executor so functions resolve inside UDF closures) — and from a
  * `plugins` config directory whose subdirectories / jars each load in
  * their own classloader, the Spark-side equivalent of the reference's
  * per-plugin module layer.
  */
trait GraftPlugin {

  /** `$stage` name (with the `$`) → stage compiler. */
  def stageExtensions: Map[String, (JsonNode, Env) => DataFrame => DataFrame] =
    Map.empty

  /** expression operator name (with the `$`) → Column compiler. */
  def expressionExtensions: Map[String, (JsonNode, Ctx) => Column] = Map.empty

  /** `$match` query operator name → (target field, operand, ctx) predicate. */
  def matchExtensions: Map[String, (Column, JsonNode, Ctx) => Column] =
    Map.empty

  /** JSLT function name → implementation over materialized arguments.
    * Resolved lazily at eval time, so it must be pure and, when the script
    * runs inside a UDF, resolvable on executors (classpath plugins are).
    */
  def jsltFunctions: Map[String, Seq[JsonNode] => JsonNode] = Map.empty
}

/** The merged registry view over every discovered plugin: first provider
  * of a name wins (classpath order, then load order), same as the
  * reference's map merge.
  */
object Plugins {

  @volatile private var extra: Seq[GraftPlugin] = Nil
  private val loadedDirs = scala.collection.mutable.Set.empty[Path]

  private lazy val classpath: Seq[GraftPlugin] =
    ServiceLoader.load(classOf[GraftPlugin], getClass.getClassLoader)
      .iterator().asScala.toSeq

  private def all: Seq[GraftPlugin] = classpath ++ extra

  /** Load a `plugins` config directory (docs/config.md `plugins` entry):
    * each subdirectory (its classes + jars) and each top-level jar becomes
    * one isolated-classloader plugin.
    */
  def loadDirectory(directory: Path): Unit = synchronized {
    if (Files.isDirectory(directory) &&
        loadedDirs.add(directory.toAbsolutePath.normalize())) {
      def listAll(dir: Path): Seq[Path] = {
        val s = Files.list(dir) // close the stream: each leaks an fd
        try s.iterator().asScala.toSeq.sortBy(_.toString)
        finally s.close()
      }
      val entries = listAll(directory)
      val loaders = entries.flatMap { p =>
        if (Files.isDirectory(p)) {
          val jars = listAll(p).filter(_.toString.endsWith(".jar"))
          Some(new java.net.URLClassLoader(
            (p +: jars).map(_.toUri.toURL).toArray, getClass.getClassLoader))
        } else if (p.toString.endsWith(".jar"))
          Some(new java.net.URLClassLoader(
            Array(p.toUri.toURL), getClass.getClassLoader))
        else None
      }
      extra = extra ++ loaders.flatMap(l =>
        ServiceLoader.load(classOf[GraftPlugin], l).iterator().asScala)
    }
  }

  /** Embedded / test registration (the reference's code-level merge). */
  def register(p: GraftPlugin): Unit = synchronized { extra = extra :+ p }
  def clear(): Unit = synchronized { extra = Nil }

  def stage(name: String): Option[(JsonNode, Env) => DataFrame => DataFrame] =
    all.iterator.flatMap(_.stageExtensions.get(name)).nextOption()

  def expression(name: String): Option[(JsonNode, Ctx) => Column] =
    all.iterator.flatMap(_.expressionExtensions.get(name)).nextOption()

  def matchOp(name: String): Option[(Column, JsonNode, Ctx) => Column] =
    all.iterator.flatMap(_.matchExtensions.get(name)).nextOption()

  def jsltFunction(name: String): Option[Seq[JsonNode] => JsonNode] =
    all.iterator.flatMap(_.jsltFunctions.get(name)).nextOption()
}
