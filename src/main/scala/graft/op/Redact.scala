package graft.op

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.{Ctx, DocModel, ExprCompiler}

/** `$redact` (docs/aggregation_stages.md:491-513): per level of the document,
  * evaluate the expression to `$$DESCEND` (keep level, recurse into embedded
  * documents), `$$PRUNE` (drop subtree) or `$$KEEP` (keep subtree, stop
  * recursing).
  *
  * The reference walks the JSON tree at runtime; here the recursion happens
  * at COMPILE time over the (known) schema, emitting nested `when` Columns —
  * the whole stage stays inside Catalyst codegen, no UDF.
  */
object Redact {
  private val Descend = "$$DESCEND"
  private val Prune = "$$PRUNE"
  private val Keep = "$$KEEP"

  /** DocModel over an embedded struct value: missing fields resolve to null
    * (Mongo treats conditions on absent fields as non-matching).
    */
  private final class StructDoc(c: Column, st: StructType) extends DocModel {
    def path(p: String): Column = {
      val parts = p.split("\\.")
      def walk(cur: Column, t: DataType, rest: List[String]): Column =
        (t, rest) match {
          case (_, Nil) => cur
          case (s: StructType, f :: tail) =>
            s.find(_.name == f) match {
              case Some(fld) => walk(cur.getField(f), fld.dataType, tail)
              case None      => lit(null)
            }
          case _ => lit(null)
        }
      walk(c, st, parts.toList)
    }
    def root: Column = c
  }

  def apply(df: DataFrame, spec: JsonNode): DataFrame = {
    val rootCtx = Stages.ctxOf(df)
    val rootVerdict = ExprCompiler.compile(spec, rootCtx)
    val rootSchema = df.schema
    val rebuilt = rootSchema.fields.map { f =>
      val redone = descendInto(spec, col(f.name), f.dataType, rootCtx)
      when(rootVerdict === Keep, col(f.name))
        .otherwise(redone)
        .as(f.name)
    }
    df.select(rebuilt.toIndexedSeq: _*).where(rootVerdict =!= Prune)
  }

  /** Recurse into embedded documents of a field value (structs, and structs
    * inside arrays); scalars pass through unchanged.
    */
  private def descendInto(
      spec: JsonNode, c: Column, t: DataType, outer: Ctx): Column = t match {
    case st: StructType =>
      val ctx = outer.copy(doc = new StructDoc(c, st))
      val verdict = ExprCompiler.compile(spec, ctx)
      val kept = struct(st.fields.map(f =>
        descendInto(spec, c.getField(f.name), f.dataType, outer).as(f.name))
        .toIndexedSeq: _*)
      when(c.isNull, lit(null).cast(t))
        .when(verdict === Prune, lit(null).cast(t))
        .when(verdict === Keep, c)
        .otherwise(kept)
    case ArrayType(et: StructType, _) =>
      // redact each embedded document; pruned elements drop from the array
      filter(
        transform(c, x => descendInto(spec, x, et, outer)),
        x => x.isNotNull)
    case _ => c
  }
}
