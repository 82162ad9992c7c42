package graft.expr.catalyst

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mongo's cross-type total order over JSON values (the BSON comparison
  * order, docs/aggregation_operators.md §$cmp; reference behavior:
  * pincette-mongo Cmp semantics): values compare inside a type bracket,
  * and brackets themselves are ordered
  *
  *   Null < Number < String < Object < Array < Boolean
  *
  * (the JSON-visible slice of MinKey < Null < Numbers < String < Object <
  * Array < BinData < ObjectId < Boolean < Date < ... < MaxKey). Numbers
  * compare numerically whatever their width; strings in UTF-8 byte order
  * (no collation); objects pairwise in document order — key name first,
  * then value, shorter object first on a tie; arrays element-wise,
  * shorter first; false < true.
  *
  * Two forms, both over JSON *text* (the schemaless message encoding):
  *
  *   - `mongo_cmp(l, r)`  → int, the comparator itself.
  *   - `mongo_sort_key(v)` → string whose plain byte order IS the Mongo
  *     order — an order-preserving collation key. This is the scale form:
  *     it feeds min_by/max_by partial aggregates, ORDER BY, and range
  *     partitioning without ever shipping a comparator to the shuffle.
  *
  * Both are native expressions whose codegen is a static call, so they
  * stay inside whole-stage codegen (no UDF serialization per row).
  */
object MongoOrder {

  /** Type bracket of a JSON node in Mongo's comparison order. */
  private def rank(n: JsonNode): Int =
    if (n == null || n.isNull || n.isMissingNode) 1
    else if (n.isNumber) 2
    else if (n.isTextual) 3
    else if (n.isObject) 4
    else if (n.isArray) 5
    else 6 // boolean

  private def utf8Compare(a: String, b: String): Int = {
    // UTF-8 byte order == code-point order (Java String order differs
    // above the BMP, so compare code points, not chars)
    val la = a.length; val lb = b.length
    var i = 0; var j = 0
    while (i < la && j < lb) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(la - i, lb - j)
  }

  def compareNodes(a: JsonNode, b: JsonNode): Int = {
    val ra = rank(a); val rb = rank(b)
    if (ra != rb) Integer.compare(ra, rb)
    else
      ra match {
        case 1 => 0
        case 2 => a.decimalValue.compareTo(b.decimalValue)
        case 3 => utf8Compare(a.asText, b.asText)
        case 4 =>
          val ia = a.fields(); val ib = b.fields()
          while (ia.hasNext && ib.hasNext) {
            val ea = ia.next(); val eb = ib.next()
            val kc = utf8Compare(ea.getKey, eb.getKey)
            if (kc != 0) return kc
            val vc = compareNodes(ea.getValue, eb.getValue)
            if (vc != 0) return vc
          }
          java.lang.Boolean.compare(ia.hasNext, ib.hasNext)
        case 5 =>
          val ia = a.elements(); val ib = b.elements()
          while (ia.hasNext && ib.hasNext) {
            val c = compareNodes(ia.next(), ib.next())
            if (c != 0) return c
          }
          java.lang.Boolean.compare(ia.hasNext, ib.hasNext)
        case _ => java.lang.Boolean.compare(a.asBoolean, b.asBoolean)
      }
  }

  /** Entry point the generated code calls. */
  def compare(a: UTF8String, b: UTF8String): Int =
    compareNodes(graft.json.Js.parse(a.toString),
      graft.json.Js.parse(b.toString))

  // ---- collation key ----------------------------------------------------
  // Grammar (all at the Java-char level; every char here is single-byte in
  // UTF-8, so char order == byte order):
  //   null    → '1'
  //   number  → '2' + decimal key (below)
  //   string  → '3' + esc(s) + '\u0000'
  //   object  → '4' + ('\u0002' + esc(key) + '\u0000' + enc(value))*
  //             + '\u0000'
  //   array   → '5' + enc(elem)* + '\u0000'
  //   boolean → '6' + ('0'|'1')
  // esc maps '\u0000'→"\u0001\u0001" and '\u0001'→"\u0001\u0002": content
  // never contains the '\u0000' terminator, and the map is strictly
  // order-preserving, so byte-compare of encodings == the Mongo order.
  //
  // The '\u0002' field-start marker disambiguates the EMPTY field key:
  // an empty key contributes no esc() bytes, so without the marker its
  // '\u0000' key terminator is byte-identical to the object terminator
  // and e.g. [{"":9}] encodes the same as [{},9] — a collision between
  // distinct values. Order is preserved: every field starts '\u0002'
  // (> the '\u0000' object end, so a prefix object still sorts first),
  // and between two fields the comparison falls through to esc(key),
  // exactly as before. Array elements need no marker — every element
  // encoding starts with a rank char ≥ '1'. (esc leaves a raw '\u0002'
  // in key content unescaped; safe, because the marker sits at a fixed
  // position per field, so compared byte positions stay aligned.)
  //
  // Decimal key: EXACT (matches mongo_cmp's BigDecimal compare — int64
  // beyond 2^53 must not collide in the key), sign-exponent-mantissa
  // memcomparable:
  //   zero     → '1'
  //   positive → '2' + hex16(2^62 + adjExp) + digits          + '!'
  //   negative → '0' + hex16(2^62 − adjExp) + 9-compl(digits) + ':'
  // where the stripped unscaled digits D are read as 0.D × 10^adjExp.
  // Bigger exponent = bigger positive (offset-binary hex keeps byte
  // order); digit strings then decide, and the terminators fix the
  // prefix cases: '!' < '0' makes 5 < 5.1, ':' > '9' makes −5.1 < −5.

  private def escInto(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\u0000') sb.append('\u0001').append('\u0001')
      else if (c == '\u0001') sb.append('\u0001').append('\u0002')
      else sb.append(c)
      i += 1
    }
  }

  private def decimalKeyInto(bd0: java.math.BigDecimal,
      sb: java.lang.StringBuilder): Unit = {
    val bd = bd0.stripTrailingZeros
    if (bd.signum == 0) { sb.append('1'); return }
    val digits = bd.unscaledValue.abs.toString
    val adjExp = bd.precision.toLong - bd.scale.toLong
    if (bd.signum > 0) {
      sb.append('2')
      sb.append(String.format("%016x",
        java.lang.Long.valueOf((1L << 62) + adjExp)))
      sb.append(digits)
      sb.append('!')
    } else {
      sb.append('0')
      sb.append(String.format("%016x",
        java.lang.Long.valueOf((1L << 62) - adjExp)))
      var i = 0
      while (i < digits.length) {
        sb.append(('9' - digits.charAt(i) + '0').toChar)
        i += 1
      }
      sb.append(':')
    }
  }

  private def keyInto(n: JsonNode, sb: java.lang.StringBuilder): Unit =
    rank(n) match {
      case 1 => sb.append('1')
      case 2 =>
        sb.append('2')
        decimalKeyInto(n.decimalValue, sb)
      case 3 =>
        sb.append('3'); escInto(n.asText, sb); sb.append('\u0000')
      case 4 =>
        sb.append('4')
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          sb.append('\u0002') // field-start marker, see grammar note
          escInto(e.getKey, sb); sb.append('\u0000')
          keyInto(e.getValue, sb)
        }
        sb.append('\u0000')
      case 5 =>
        sb.append('5')
        val it = n.elements()
        while (it.hasNext) keyInto(it.next(), sb)
        sb.append('\u0000')
      case _ =>
        sb.append('6').append(if (n.asBoolean) '1' else '0')
    }

  def sortKeyOf(n: JsonNode): String = {
    val sb = new java.lang.StringBuilder
    keyInto(n, sb)
    sb.toString
  }

  /** Entry point the generated code calls. */
  def sortKey(v: UTF8String): UTF8String =
    UTF8String.fromString(sortKeyOf(graft.json.Js.parse(v.toString)))
}

/** `mongo_cmp(l: string, r: string): int` — Mongo total-order comparator
  * over two JSON texts.
  */
case class MongoCmp(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "mongo_cmp"

  override def nullSafeEval(a: Any, b: Any): Any =
    MongoOrder.compare(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.catalyst.MongoOrder.compare($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MongoCmp =
    copy(left = newLeft, right = newRight)
}

/** `mongo_sort_key(v: string): string` — order-preserving collation key
  * for the Mongo total order; plain byte order of the key equals
  * `mongo_cmp` on the values.
  */
case class MongoSortKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "mongo_sort_key"

  override def nullSafeEval(v: Any): Any =
    MongoOrder.sortKey(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expr.catalyst.MongoOrder.sortKey($v)")

  override protected def withNewChildInternal(
      newChild: Expression): MongoSortKey = copy(child = newChild)
}
