package graft.expr

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.json.Js

/** Compiles the MongoDB query language used by `$match` and `$deduplicate`
  * etc. (/root/reference/docs/query.md) to a Catalyst predicate Column.
  *
  * Semantics notes vs the reference:
  *  - field "presence" ($exists) maps to SQL NULL-ness: the relational model
  *    represents an absent JSON field as NULL (docs/query.md:134-143).
  *  - $ne / $not / $nin match documents where the field is missing
  *    (docs/query.md:64-84); compiled as `NOT coalesce(cond, false)` so NULLs
  *    pass, like Mongo.
  */
object QueryCompiler {

  private val operatorKeys = Set(
    "$eq", "$gt", "$gte", "$lt", "$lte", "$ne", "$in", "$nin", "$exists",
    "$type", "$expr", "$mod", "$regex", "$options", "$all", "$elemMatch",
    "$size", "$bitsAllClear", "$bitsAllSet", "$bitsAnyClear", "$bitsAnySet",
    "$not", "$comment")

  /** Whole `$match` document → predicate. */
  def compile(n: JsonNode, ctx: Ctx): Column = {
    val conds = Js.fields(n).flatMap {
      case ("$comment", _) => None
      case ("$and", v) => Some(Js.elems(v).map(compile(_, ctx)).reduce(_ && _))
      case ("$or", v)  => Some(Js.elems(v).map(compile(_, ctx)).reduce(_ || _))
      case ("$nor", v) =>
        Some(!Js.elems(v).map(c => coalesce(compile(c, ctx), lit(false)))
          .reduce(_ || _))
      case ("$expr", v) => Some(ExprCompiler.compile(v, ctx))
      case (field, cond) if !ctx.doc.has(field) =>
        Some(missingFieldMatch(cond))
      // dotted paths in the variant model traverse intermediate arrays
      // (Mongo: {"items.qty": 2} matches items:[{qty:1},{qty:2}]); the
      // single-segment path keeps the fused extract-with-hint fast path
      case (field, cond) if ctx.doc.isInstanceOf[VariantDoc] &&
          field.contains(".") =>
        Some(variantPathConds(ctx.doc.root, field.split("\\.").toList,
          cond, ctx))
      case (field, cond) =>
        Some(fieldMatch(hint => ctx.doc.pathAs(field, hint), cond, ctx))
    }
    if (conds.isEmpty) lit(true) else conds.reduce(_ && _)
  }

  /** Mongo semantics when NO document has the field (the typed schema
    * lacks the column, reference app3): the field "doesn't exist", so
    * `$exists:false`, `$ne`, `$nin`, null equality and `$in` containing
    * null match every document; everything else matches none; `$not`
    * inverts its operand's missing-field result.
    */
  private def missingFieldMatch(cond: JsonNode): Column =
    if (isOperatorObject(cond))
      Js.fields(cond).flatMap {
        case ("$comment", _) | ("$options", _) => None
        case ("$exists", v)       => Some(lit(!v.asBoolean()))
        case ("$eq", v)           => Some(lit(v.isNull))
        case ("$ne", v)           => Some(lit(!v.isNull))
        case ("$nin", v)          => Some(lit(!Js.elems(v).exists(_.isNull)))
        case ("$in", v)           => Some(lit(Js.elems(v).exists(_.isNull)))
        case ("$not", v)          => Some(!missingFieldMatch(v))
        case _                    => Some(lit(false))
      }.reduceOption(_ && _).getOrElse(lit(true))
    else lit(cond.isNull) // Mongo: {field: null} matches missing fields

  /** Condition for one field: operator object or implicit equality. The
    * target is resolved per comparison with the literal as a type hint
    * (needed by the variant model; no-op for typed models).
    */
  private def fieldMatch(target: JsonNode => Column, cond: JsonNode,
      ctx: Ctx): Column =
    if (isOperatorObject(cond)) operatorConds(target, cond, ctx)
    else eqMatchField(target, cond, ctx)

  /** Extraction type hint from a comparison literal (variant model):
    * `try_variant_get` with the hint nulls out cross-bracket values, so
    * comparisons stay type-bracketed like Mongo's.
    */
  private def hintType(v: JsonNode): String =
    if (v == null) null
    else if (v.isTextual) "string"
    else if (v.isNumber) "double"
    else if (v.isBoolean) "boolean"
    else null

  /** Dotted-path `$match` resolution over the variant model with Mongo's
    * array traversal (docs/query.md:5-28): an INTERMEDIATE segment that
    * resolves to an array of documents applies the rest of the path to
    * each element, and the condition matches if the direct value or any
    * traversed element matches; the LEAF segment's array handling lives
    * in the operators themselves (eqMatchField / elemOrSelf). One
    * traversal per segment — Mongo does not descend nested arrays
    * ([[{b:1}]] never matches "a.b") and neither does this. Numeric
    * segments are field names, not array indexes (deviation).
    */
  /** Dotted-path condition entry: negation-shaped operators (`$ne`,
    * `$nin`, `$not`, `$exists:false`) must hold for EVERY value the path
    * traversal reaches — Mongo's `{"items.qty": {$ne: 2}}` does NOT
    * match `items:[{qty:1},{qty:2}]` — but the traversal applies its
    * condition per element via exists(), which would give any-element
    * semantics. So the operator object splits here, each negated
    * operator compiles its POSITIVE form through the traversal and the
    * negation hoists outside the disjunction (the same shape the leaf
    * `$ne` gets from `!coalesce(eqMatchField, false)`). Splitting also
    * matches Mongo for POSITIVE operators: `{$gt:5, $lt:9}` over an
    * array may be satisfied by different elements (that is what
    * `$elemMatch` is for), exactly like the non-dotted leaf where each
    * operator runs its own `elemOrSelf` probe.
    */
  private def variantPathConds(root: Column, parts: List[String],
      cond: JsonNode, ctx: Ctx): Column =
    if (!isOperatorObject(cond)) variantPathMatch(root, parts, cond, ctx)
    else {
      def one(op: String, v: JsonNode): JsonNode = {
        val o = Js.obj()
        o.set[JsonNode](op, v)
        // $regex travels with its sibling $options
        if (op == "$regex" && cond.has("$options"))
          o.set[JsonNode]("$options", cond.get("$options"))
        o
      }
      def pos(c: Column): Column = coalesce(c, lit(false))
      val conds = Js.fields(cond).flatMap {
        case ("$comment", _) | ("$options", _) => None
        case ("$ne", v) =>
          Some(!pos(variantPathMatch(root, parts, one("$eq", v), ctx)))
        case ("$nin", v) =>
          Some(!pos(variantPathMatch(root, parts, one("$in", v), ctx)))
        case ("$exists", v) if !v.asBoolean() =>
          Some(!pos(variantPathMatch(root, parts,
            one("$exists", Js.parse("true")), ctx)))
        case ("$not", v) =>
          Some(!pos(variantPathConds(root, parts, v, ctx)))
        case (op, v) =>
          Some(variantPathMatch(root, parts, one(op, v), ctx))
      }
      conds.reduceOption(_ && _).getOrElse(lit(true))
    }

  private def variantPathMatch(cur: Column, parts: List[String],
      cond: JsonNode, ctx: Ctx): Column = {
    val f = parts.head
    if (parts.tail.isEmpty) {
      val leafRaw = call_function("variant_get", cur, lit("$." + f))
      val target: JsonNode => Column = v =>
        Option(hintType(v)).map(t =>
          call_function("try_variant_get", cur, lit("$." + f), lit(t)))
          .getOrElse(leafRaw)
      // register the leaf by IDENTITY so every consumer (eqMatchField,
      // isNullish, asQueryArr, $type) sees VariantType even inside a
      // traversal lambda, where the analyzer probe cannot resolve
      fieldMatch(target, cond,
        ctx.withTypedVar("__pm", leafRaw, VariantType))
    } else {
      val next = call_function("variant_get", cur, lit("$." + f))
      val direct = variantPathMatch(next, parts.tail, cond, ctx)
      val arr = call_function("try_variant_get", next, lit("$"),
        lit("array<variant>"))
      // through a NON-EMPTY array the only resolution is element-wise —
      // without the guard, variant_get(array, "$.rest") answers null and
      // {path: null} would wrongly match every doc whose elements all
      // carry the field; an EMPTY array resolves to nothing, which is
      // exactly the direct branch's null (Mongo: {a:[]} matches
      // {"a.b": null})
      ((arr.isNull || size(arr) === 0) && coalesce(direct, lit(false))) ||
        coalesce(exists(arr, x => variantPathMatch(x, parts.tail, cond,
          ctx)), lit(false))
    }
  }

  /** Range/regex/mod operator on a field: Mongo matches when the value
    * OR any array element satisfies it. Typed models answer the direct
    * comparison; the variant model adds the per-row element probe with
    * the same hint-typed extraction (cross-bracket elements null out and
    * never match, like Mongo's type bracketing).
    */
  private def elemOrSelf(target: JsonNode => Column, v: JsonNode,
      ctx: Ctx)(pred: Column => Column): Column = {
    val raw = target(null)
    ctx.typeOf(raw) match {
      case t if t.typeName == "variant" =>
        coalesce(pred(target(v)), lit(false)) ||
          coalesce(exists(asQueryArr(raw, ctx), x =>
            pred(Option(hintType(v)).map(ht =>
              call_function("try_variant_get", x, lit("$"), lit(ht)))
              .getOrElse(x))), lit(false))
      case _: ArrayType =>
        // typed array field: any-element semantics only — the direct
        // scalar comparison would not analyze against an array column
        coalesce(exists(raw, x => pred(x)), lit(false))
      case _ => pred(target(v))
    }
  }

  /** Query-side array view of a field: a typed array passes through; a
    * VARIANT extracts as `array<variant>` per row, answering null for
    * non-arrays — Mongo's `$size`/`$all`/`$elemMatch` and the array
    * element probes match NOTHING on a non-array field rather than
    * erroring (so the expression path's throwing cast doesn't apply).
    */
  private def asQueryArr(c: Column, ctx: Ctx): Column =
    if (ctx.typeOf(c).typeName == "variant")
      call_function("try_variant_get", c, lit("$"), lit("array<variant>"))
    else c

  /** Canonical JSON text of a query literal for `mongo_cmp` comparison
    * against a variant's `to_json`: object keys sort recursively because
    * the variant binary encoding sorts keys at parse time (documented
    * deviation — field order is unrecoverable in the schemaless model).
    */
  private def canonJson(n: JsonNode): String =
    if (n.isArray) Js.elems(n).map(canonJson).mkString("[", ",", "]")
    else if (n.isObject)
      Js.fields(n).sortBy(_._1).map { case (k, v) =>
        com.fasterxml.jackson.databind.node.TextNode.valueOf(k).toString +
          ":" + canonJson(v)
      }.mkString("{", ",", "}")
    else n.toString

  /** Mongo equality between one VARIANT value and a query literal, in the
    * cross-type total order (2 matches 2.0; a number never matches a
    * string; an explicit JSON null matches the null literal).
    */
  private def variantEqLit(x: Column, v: JsonNode): Column =
    if (v.isNull) x.isNull || call_function("is_variant_null", x)
    else call_function("mongo_cmp",
      coalesce(to_json(x), lit("null")), lit(canonJson(v))) === 0

  /** `$in` on a typed field: scalar-list membership on the hint-typed
    * extraction, or — when the field holds a typed ARRAY — any-element
    * membership (Mongo), which the scalar isin would fail to analyze.
    * A null in the list makes $in match null/missing fields (and arrays
    * holding a null element); a SQL IN with a null element would
    * instead match none of them.
    */
  private def typedInCond(target: JsonNode => Column, v: JsonNode,
      ctx: Ctx): Column = {
    val (nulls, vals) = Js.elems(v).partition(_.isNull)
    // the extraction hint must come from a NON-null element: a null
    // hint extracts the raw variant and compares variant-vs-literal
    val hint = vals.headOption.orNull
    val raw = target(null)
    val isArr = ctx.typeOf(raw).isInstanceOf[ArrayType]
    val base =
      if (vals.isEmpty) lit(false)
      else if (isArr) exists(raw, x => x.isin(vals.map(scalaValue): _*))
      else target(hint).isin(vals.map(scalaValue): _*)
    // the null test must probe the RAW extraction: the typed
    // try_variant_get answers SQL null on a type MISMATCH too, which
    // would make a string field wrongly count as null here
    if (nulls.isEmpty) base
    else coalesce(base, lit(false)) || isNullish(raw, ctx) ||
      (if (isArr) coalesce(exists(raw, _.isNull), lit(false))
       else lit(false))
  }

  /** `$in` on a variant field: scalar literals GROUP by extraction type
    * — one typed `isin` on the value plus one element probe per type
    * group (`exists` is an interpreted higher-order pass: a 1000-element
    * $in must cost <= 3 passes per row, not 1000) — while null and
    * structured literals keep the per-element equality (null matches
    * null/missing/element-null; objects compare in Mongo order).
    */
  private def variantInCond(target: JsonNode => Column,
      elems: Seq[JsonNode], ctx: Ctx): Column =
    if (elems.isEmpty) lit(false)
    else {
      val raw = target(null)
      val arr = asQueryArr(raw, ctx)
      val (scalars, rest) = elems.partition(e => hintType(e) != null)
      val scalarConds = scalars.groupBy(hintType).toSeq.sortBy(_._1)
        .map { case (t, vs) =>
          val vals = vs.map(scalaValue)
          coalesce(target(vs.head).isin(vals: _*), lit(false)) ||
            coalesce(exists(arr, x =>
              call_function("try_variant_get", x, lit("$"), lit(t))
                .isin(vals: _*)), lit(false))
        }
      val restConds = rest.map(e => eqMatchField(target, e, ctx))
      (scalarConds ++ restConds).reduce(_ || _)
    }

  /** Mongo equality on a field resolved through `target`: besides direct
    * value equality, an ARRAY-holding field matches when ANY element
    * equals the literal (docs/query.md:5-28). Typed models get the
    * element probe from eqMatch's ArrayType branch; the variant model
    * probes the per-row array view — without it a schemaless
    * `{nums: 5}` over `nums: [1,5]` silently matched nothing.
    */
  private def eqMatchField(target: JsonNode => Column, v: JsonNode,
      ctx: Ctx): Column = {
    val raw = target(null)
    if (ctx.typeOf(raw).typeName != "variant") eqMatch(target(v), v, ctx)
    else {
      val direct =
        if (v.isNull) isNullish(raw, ctx)
        else if (v.isObject || v.isArray)
          // no typed extraction exists for structured literals —
          // whole-value Mongo equality over the JSON text (`===` on a
          // variant would string-coerce or fail analysis)
          call_function("mongo_cmp",
            coalesce(to_json(raw), lit("null")), lit(canonJson(v))) === 0
        else eqMatch(target(v), v, ctx)
      coalesce(direct, lit(false)) ||
        coalesce(exists(asQueryArr(raw, ctx), x => variantEqLit(x, v)),
          lit(false))
    }
  }

  /** Mongo: in the condition position, any `$`-prefixed key set makes an
    * operator object (unknown operators then fail loudly in operatorConds —
    * unless a plugin provides them, docs/plugins.md).
    */
  private def isOperatorObject(n: JsonNode): Boolean =
    n.isObject && n.size() > 0 &&
      Js.fields(n).forall { case (k, _) =>
        operatorKeys.contains(k) || k.startsWith("$") }

  /** Mongo equality on a field: direct equality, or — if the field holds an
    * array — any-element equality (docs/query.md:5-28).
    */
  /** Mongo-null predicate for a field: in the relational model both a
    * stored null and an absent field are SQL NULL; in the variant model an
    * EXPLICIT JSON null ({"f":null}) is a non-null variant carrying a
    * variant-null value, so it must also count — {f:null} and {$eq:null}
    * match it, and {$ne:null}/{$nin:[null,..]} must not.
    */
  private def isNullish(target: Column, ctx: Ctx): Column =
    ctx.typeOf(target) match {
      case t if t.typeName == "variant" =>
        target.isNull || call_function("is_variant_null", target)
      case _ => target.isNull
    }

  private def eqMatch(target: Column, v: JsonNode, ctx: Ctx): Column = {
    val value = litNode(v)
    // {field: null} matches null AND missing fields in Mongo — both are
    // SQL NULL in the relational model; `=== lit(null)` would match none
    if (v.isNull) isNullish(target, ctx)
    else ctx.typeOf(target) match {
      case ArrayType(et, _) if !v.isArray =>
        array_contains(target, value.cast(et))
      case _ => target === value
    }
  }

  /** `$elemMatch` condition over the field's array view: any element
    * satisfying the sub-query/operator object (shared by the direct
    * operator and its `$all` composition).
    */
  private def elemMatchCond(target: JsonNode => Column, v: JsonNode,
      ctx: Ctx): Column = {
    val raw = target(null)
    val variant = ctx.typeOf(raw).typeName == "variant"
    coalesce(
      exists(asQueryArr(raw, ctx), x => compileValuePredicate(v, x,
        if (variant) ctx.withTypedVar("__e", x, VariantType) else ctx)),
      lit(false))
  }

  private def operatorConds(target: JsonNode => Column, n: JsonNode,
      ctx: Ctx): Column = {
    val opts =
      if (n.has("$options")) n.get("$options").asText() else ""
    val conds = Js.fields(n).flatMap {
      case ("$comment", _) | ("$options", _) => None
      case ("$eq", v)  => Some(eqMatchField(target, v, ctx))
      case ("$gt", v)  => Some(elemOrSelf(target, v, ctx)(_ > litNode(v)))
      case ("$gte", v) => Some(elemOrSelf(target, v, ctx)(_ >= litNode(v)))
      case ("$lt", v)  => Some(elemOrSelf(target, v, ctx)(_ < litNode(v)))
      case ("$lte", v) => Some(elemOrSelf(target, v, ctx)(_ <= litNode(v)))
      case ("$ne", v) =>
        Some(!coalesce(eqMatchField(target, v, ctx), lit(false)))
      // variant fields: $in is Mongo's OR-of-equalities (and $nin its
      // negation) — each equality carries the any-array-element probe,
      // so {$in:[5]} matches nums:[1,5] and {$in:[null]} matches an
      // array holding an explicit null, like Mongo
      case ("$in", v) if ctx.typeOf(target(null)).typeName == "variant" =>
        Some(variantInCond(target, Js.elems(v), ctx))
      case ("$nin", v) if ctx.typeOf(target(null)).typeName == "variant" =>
        Some(!coalesce(variantInCond(target, Js.elems(v), ctx),
          lit(false)))
      case ("$in", v) =>
        Some(typedInCond(target, v, ctx))
      case ("$nin", v) =>
        val (nulls, _) = Js.elems(v).partition(_.isNull)
        val notIn = !coalesce(typedInCond(target, v, ctx), lit(false))
        // a null in the list excludes null/missing fields from $nin;
        // typedInCond already folds the null cases into the match side
        Some(if (nulls.isEmpty) notIn
        else notIn && !isNullish(target(null), ctx))
      case ("$exists", v) =>
        Some(if (v.asBoolean()) target(null).isNotNull
        else target(null).isNull)
      case ("$type", v) =>
        // per-row for schemaless (variant) fields; folds to a constant
        // for typed columns — the old static answer called every variant
        // field "object". Mongo also accepts an ARRAY of type names
        // (matches any); asText() on an array is "" and would silently
        // match nothing
        val t = ExprCompiler.mongoTypeOf(target(null), ctx)
        Some(
          if (v.isArray)
            Js.elems(v).map(e => t === e.asText())
              .reduceOption(_ || _).getOrElse(lit(false))
          else t === v.asText())
      case ("$expr", v) => Some(ExprCompiler.compile(v, ctx))
      case ("$mod", v) =>
        Some(elemOrSelf(target, v.get(0), ctx)(
          _ % litNode(v.get(0)) === litNode(v.get(1))))
      case ("$regex", v) =>
        val hint = Js.parse("\"s\"") // force string extraction
        val re = ExprCompiler.regexWithOptions(
          ExprCompiler.regexLiteral(v), opts)
        Some(elemOrSelf(target, hint, ctx)(_.rlike(re)))
      case ("$all", v) => // Mongo: an empty $all list matches NOTHING
        // $all ≡ AND of single equalities (Mongo manual) — on the variant
        // path eqMatchField carries both the whole-value and the
        // any-element match, covering Mongo's non-array-field edge too.
        // {$all: [{$elemMatch: q}, ...]} is Mongo's documented
        // composition: EACH member must have a matching element —
        // treating it as an object literal would silently match nothing
        Some(Js.elems(v).map {
          case e if e.isObject && e.size() == 1 && e.has("$elemMatch") =>
            elemMatchCond(target, e.get("$elemMatch"), ctx)
          case e if ctx.typeOf(target(null)).typeName == "variant" =>
            eqMatchField(target, e, ctx)
          case e => array_contains(target(null), litNode(e))
        }.reduceOption(_ && _).getOrElse(lit(false)))
      case ("$elemMatch", v) => Some(elemMatchCond(target, v, ctx))
      case ("$size", v) =>
        Some(size(asQueryArr(target(null), ctx)) === litNode(v))
      case ("$bitsAllSet", v) =>
        val m = mask(v); Some(target(v).bitwiseAND(m) === m)
      case ("$bitsAllClear", v) => Some(target(v).bitwiseAND(mask(v)) === 0)
      case ("$bitsAnySet", v)   => Some(target(v).bitwiseAND(mask(v)) =!= 0)
      case ("$bitsAnyClear", v) =>
        val m = mask(v); Some(target(v).bitwiseAND(m) =!= m)
      case ("$not", v) =>
        Some(!coalesce(operatorConds(target, v, ctx), lit(false)))
      case (other, v) => // plugin-provided query operators (docs/plugins.md)
        Some(graft.plugin.Plugins.matchOp(other)
          .map(f => f(target(v), v, ctx))
          .getOrElse(throw new IllegalArgumentException(
            s"unsupported query operator $other")))
    }
    conds.reduce(_ && _)
  }

  /** Predicate over a bare value (array `$elemMatch`, expression-operator
    * `$elemMatch`): the condition is either an operator object applied to the
    * value itself or a query over the value's fields.
    */
  private[graft] def compileValuePredicate(
      cond: JsonNode, x: Column, ctx: Ctx): Column = {
    // a VARIANT element (schemaless $elemMatch: the caller types the
    // lambda var via Ctx.withTypedVar) extracts hint-directed typed
    // values, mirroring VariantDoc.pathAs — getField/raw comparison
    // would fail analysis on the variant
    val variant = ctx.typeOf(x).typeName == "variant"
    def self(v: JsonNode): Column =
      if (!variant) x
      else Option(hintType(v)).map(t =>
        call_function("try_variant_get", x, lit("$"), lit(t))).getOrElse(x)
    def fieldOf(field: String)(v: JsonNode): Column =
      if (!variant) field.split("\\.").foldLeft(x)(_.getField(_))
      else {
        val p = "$." + field
        Option(hintType(v)).map(t =>
          call_function("try_variant_get", x, lit(p), lit(t)))
          .getOrElse(call_function("variant_get", x, lit(p)))
      }
    if (isOperatorObject(cond)) operatorConds(self, cond, ctx)
    else
      Js.fields(cond).map { case (field, c) =>
        // dotted sub-paths over variant elements traverse intermediate
        // arrays, same as the top-level resolver
        if (variant && field.contains("."))
          variantPathMatch(x, field.split("\\.").toList, c, ctx)
        else fieldMatch(fieldOf(field), c, ctx)
      }.reduce(_ && _)
  }

  /** Bit mask: literal number or array of bit positions (docs/query.md:231+). */
  private def mask(n: JsonNode): Long =
    if (n.isArray) Js.elems(n).map(p => 1L << p.asLong()).foldLeft(0L)(_ | _)
    else n.asLong()

  /** Query-language values are literals, never `$path` expressions. */
  private[graft] def litNode(n: JsonNode): Column =
    if (n.isTextual) lit(n.asText())
    else if (n.isInt || n.isLong) lit(n.asLong())
    else if (n.isNumber) lit(n.asDouble())
    else if (n.isBoolean) lit(n.asBoolean())
    else if (n.isNull) lit(null)
    else if (n.isArray) array(Js.elems(n).map(litNode): _*)
    else struct(Js.fields(n).map { case (k, v) => litNode(v).as(k) }: _*)

  private def scalaValue(n: JsonNode): Any =
    if (n.isTextual) n.asText()
    else if (n.isInt || n.isLong) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    // array/object list elements used to become Scala null — an isin()
    // that silently matches nothing; refuse instead
    else throw new IllegalArgumentException(
      s"unsupported $$in/$$nin element: ${n.getNodeType}")
}
