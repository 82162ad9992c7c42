package graft.jq

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{BooleanNode, DoubleNode, LongNode, NullNode, ObjectNode, TextNode}
import graft.json.Js
import scala.collection.mutable

/** A small JSLT interpreter covering the subset the reference's
  * applications use (docs/aggregation_operators.md:1176-1187, fixture
  * scripts under src/test/resources/app8/app35/app36): paths (with array
  * indexes and hyphenated segments), the pipe `expr | expr` (rebinds `.`),
  * object construction with the `* : .` rest-spread matcher (explicitly
  * listed keys are excluded; null-valued pairs are omitted, which is how a
  * script deletes a field), parameterized `def` functions,
  * `import ... as ns` (resolved relative to the importing file), `$var`
  * references and arithmetic.
  *
  * Independent implementation of the public JSLT language subset.
  */
object MiniJslt {

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step
  final case class DynIdx(e: Ast) extends Step // `.a[expr]`
  final case class SliceStep(from: Option[Ast], to: Option[Ast]) extends Step

  sealed trait Ast
  case object Dot extends Ast
  final case class Path(parts: List[Step]) extends Ast
  final case class Var(name: String) extends Ast
  final case class Lit(v: JsonNode) extends Ast
  final case class BinOp(op: String, l: Ast, r: Ast) extends Ast
  final case class PipeOp(l: Ast, r: Ast) extends Ast
  /** `lets` bind before the fields; the matcher (`spread`) evaluates its
    * expression per UNMATCHED key with `.` bound to that key's value, and
    * `minus` lists keys the matcher must skip (`* - a, b : expr`).
    */
  final case class ObjCons(lets: List[(String, Ast)],
      fields: List[(Ast, Ast)],
      spread: Option[(List[String], Ast)]) extends Ast
  final case class CallFn(ns: Option[String], name: String, args: List[Ast])
      extends Ast
  final case class PathOf(base: Ast, parts: List[Step]) extends Ast

  final case class IfE(cond: Ast, thn: Ast, els: Ast) extends Ast
  final case class ArrFor(src: Ast, body: Ast, cond: Option[Ast]) extends Ast
  final case class ArrLit(items: List[Ast]) extends Ast
  final case class ObjFor(src: Ast, key: Ast, value: Ast,
      cond: Option[Ast]) extends Ast

  final case class FnDef(params: List[String], body: Ast)
  final case class Program(defs: Map[String, FnDef],
      lets: List[(String, Ast)], body: Ast)

  /** `base` is the app-root-relative path of the script being compiled;
    * nested imports resolve against its directory.
    */
  def compile(script: String,
      load: String => String = f =>
        throw new IllegalArgumentException(s"no script loader for $f"),
      base: String = ""): JsonNode => JsonNode = {
    val prog = parse(script, load, base)
    input => {
      val vars = prog.lets.foldLeft(Map.empty[String, JsonNode]) {
        case (vs, (n, e)) => vs + (n -> eval(e, input, vs, prog.defs))
      }
      eval(prog.body, input, vars, prog.defs)
    }
  }

  private def parse(script: String, load: String => String, base: String)
      : Program = {
    val t = new Tok(script)
    val defs = mutable.Map[String, FnDef]()
    val lets = mutable.ListBuffer[(String, Ast)]()
    var more = true
    while (more) {
      if (t.peekIs("import")) {
        t.next(); val file = t.string(); t.expectWord("as"); val ns = t.word()
        val full = Js.relativeTo(base, file)
        parse(load(full), load, full).defs.foreach { case (k, v) =>
          defs(s"$ns:$k") = v
        }
      } else if (t.peekIs("let")) { // let name = expr
        t.next(); val name = t.word(); t.expect("=")
        lets += name -> parseExpr(t)
      } else if (t.peekIs("def")) {
        t.next(); val name = t.word(); t.expect("(")
        val params = mutable.ListBuffer[String]()
        while (!t.peekIs(")")) {
          params += t.word(); if (t.peekIs(",")) t.next()
        }
        t.expect(")")
        defs(name) = FnDef(params.toList, parseExpr(t))
      } else more = false
    }
    Program(defs.toMap, lets.toList,
      if (t.peek == null) Dot else parseExpr(t))
  }

  private def parseExpr(t: Tok): Ast = {
    var l = parseOr(t)
    while (t.peekIs("|")) { t.next(); l = PipeOp(l, parseOr(t)) }
    l
  }

  private def parseOr(t: Tok): Ast = {
    var l = parseAnd(t)
    while (t.peekIs("or")) { t.next(); l = BinOp("or", l, parseAnd(t)) }
    l
  }

  private def parseAnd(t: Tok): Ast = {
    var l = parseCmp(t)
    while (t.peekIs("and")) { t.next(); l = BinOp("and", l, parseCmp(t)) }
    l
  }

  private val cmpOps = Set("==", "!=", "<", ">", "<=", ">=")

  private def parseCmp(t: Tok): Ast = {
    val l = parseAdd(t)
    if (t.peek != null && cmpOps(t.peek)) {
      val op = t.next()
      BinOp(op, l, parseAdd(t))
    } else l
  }

  private def parseAdd(t: Tok): Ast = {
    var l = parseMul(t)
    while (t.peekIs("+") || t.peekIs("-")) {
      val op = t.next(); l = BinOp(op, l, parseMul(t))
    }
    l
  }

  private def parseMul(t: Tok): Ast = {
    var l = parsePostfix(t)
    while (t.peekIs("*") || t.peekIs("/")) {
      val op = t.next(); l = BinOp(op, l, parsePostfix(t))
    }
    l
  }

  /** `(expr).key`, `$var[0]`, `call(x).a` — steps after any primary. */
  private def parsePostfix(t: Tok): Ast = {
    var l = parsePrim(t)
    var more = true
    while (more) {
      if (t.peekIs(".") && (t.peekWordAfterDot || t.peekStringAfterDot)) {
        t.next()
        l = PathOf(l, parseSteps(t, leadWord = true))
      } else if (t.peekIs("["))
        l = PathOf(l, parseSteps(t, leadWord = false))
      else more = false
    }
    l match { // fold .-rooted paths back to plain Path
      case PathOf(Dot, parts) => Path(parts)
      case other              => other
    }
  }

  /** `.a`, `.a.b`, `.a[0].b`, `.a[.k]`, `.a[1:2]`, `."x y"` — after the
    * leading dot (or directly at a `[`).
    */
  private def parseSteps(t: Tok, leadWord: Boolean): List[Step] = {
    val parts = mutable.ListBuffer.empty[Step]
    if (leadWord)
      parts += Field(if (t.peekString) t.string() else t.word())
    var more = true
    while (more) {
      if (t.peekIs("[")) {
        t.next()
        if (t.peekIs(":")) { // [:to]
          t.next(); parts += SliceStep(None, Some(parseExpr(t)))
        } else {
          val e = parseExpr(t)
          if (t.peekIs(":")) {
            t.next()
            val to = if (t.peekIs("]")) None else Some(parseExpr(t))
            parts += SliceStep(Some(e), to)
          } else
            parts += (e match {
              case Lit(n) if n.isIntegralNumber => Index(n.asInt())
              case dyn                          => DynIdx(dyn)
            })
        }
        t.expect("]")
      } else if (t.peekIs(".") && (t.peekWordAfterDot || t.peekStringAfterDot)) {
        t.next()
        parts += Field(if (t.peekString) t.string() else t.word())
      } else more = false
    }
    parts.toList
  }

  private def parsePrim(t: Tok): Ast = t.peek match {
    case "if" => // JSLT: if (cond) expr [else expr]; no else -> null
      t.next(); t.expect("(")
      val cond = parseExpr(t)
      t.expect(")")
      val thn = parseExpr(t)
      val els =
        if (t.peekIs("else")) { t.next(); parseExpr(t) }
        else Lit(NullNode.getInstance)
      IfE(cond, thn, els)
    case "." =>
      t.next()
      if (t.peekWord || t.peekString || t.peekIs("["))
        Path(parseSteps(t, leadWord = !t.peekIs("[")))
      else Dot
    case "$" => t.next(); Var(t.word())
    case "[" if t.peekAfterIs("for") => // [for (src) body if (cond)]
      t.next(); t.next(); t.expect("(")
      val src = parseExpr(t); t.expect(")")
      val body = parseExpr(t)
      val cond =
        if (t.peekIs("if")) { t.next(); t.expect("(")
          val c = parseExpr(t); t.expect(")"); Some(c) }
        else None
      t.expect("]")
      ArrFor(src, body, cond)
    case "[" => // array literal
      t.next()
      val items = mutable.ListBuffer[Ast]()
      while (!t.peekIs("]")) {
        items += parseExpr(t); if (t.peekIs(",")) t.next()
      }
      t.expect("]")
      ArrLit(items.toList)
    case "{" if t.peekAfterIs("for") => // {for (src) key : value [if (c)]}
      t.next(); t.next(); t.expect("(")
      val src = parseExpr(t); t.expect(")")
      val key = parseExpr(t); t.expect(":")
      val value = parseExpr(t)
      val cond =
        if (t.peekIs("if")) { t.next(); t.expect("(")
          val c = parseExpr(t); t.expect(")"); Some(c) }
        else None
      t.expect("}")
      ObjFor(src, key, value, cond)
    case "{" =>
      t.next()
      val lets = mutable.ListBuffer[(String, Ast)]()
      val fields = mutable.ListBuffer[(Ast, Ast)]()
      var spread: Option[(List[String], Ast)] = None
      while (!t.peekIs("}")) {
        if (t.peekIs("*")) { // * : expr | * - k1, k2 : expr
          t.next()
          val minus = mutable.ListBuffer[String]()
          if (t.peekIs("-")) {
            t.next()
            minus += (if (t.peekString) t.string() else t.word())
            while (t.peekIs(",")) {
              t.next()
              minus += (if (t.peekString) t.string() else t.word())
            }
          }
          t.expect(":")
          spread = Some((minus.toList, parseExpr(t)))
        } else if (t.peekIs("let")) { // object-scoped let
          t.next(); val n = t.word(); t.expect("=")
          lets += n -> parseExpr(t)
        } else {
          val key: Ast =
            if (t.peekString) Lit(TextNode.valueOf(t.string()))
            else if (t.peekWord) Lit(TextNode.valueOf(t.word()))
            else { t.expect("("); val k = parseExpr(t); t.expect(")"); k }
          t.expect(":")
          fields += key -> parseExpr(t)
        }
        if (t.peekIs(",")) t.next()
      }
      t.expect("}")
      ObjCons(lets.toList, fields.toList, spread)
    case "(" => t.next(); val e = parseExpr(t); t.expect(")"); e
    case s if t.peekString => Lit(TextNode.valueOf(t.string()))
    case "-" => // unary minus: the tokenizer emits '-' standalone
      t.next()
      val n = t.next()
      require(n != null && n.nonEmpty && n.head.isDigit,
        s"expected number after '-', found '$n'")
      Lit(if (n.contains('.')) DoubleNode.valueOf(-n.toDouble)
      else LongNode.valueOf(-n.toLong))
    case s if s != null && s.head.isDigit =>
      val n = t.next()
      Lit(if (n.contains('.')) DoubleNode.valueOf(n.toDouble)
      else LongNode.valueOf(n.toLong))
    case "true"  => t.next(); Lit(BooleanNode.TRUE)
    case "false" => t.next(); Lit(BooleanNode.FALSE)
    case "null"  => t.next(); Lit(NullNode.getInstance)
    case _ =>
      val name = t.word()
      if (t.peekIs(":")) { // ns:fn(...)
        t.next(); val fn = t.word(); parseCall(t, Some(name), fn)
      } else parseCall(t, None, name)
  }

  private def parseCall(t: Tok, ns: Option[String], name: String): Ast = {
    t.expect("(")
    val args = mutable.ListBuffer[Ast]()
    while (!t.peekIs(")")) {
      args += parseExpr(t); if (t.peekIs(",")) t.next()
    }
    t.expect(")")
    CallFn(ns, name, args.toList) // postfix paths attach in parsePostfix
  }

  private def eval(ast: Ast, in: JsonNode, vars: Map[String, JsonNode],
      defs: Map[String, FnDef]): JsonNode = ast match {
    case Dot => in
    case Path(parts) => walk(in, parts, in, vars, defs)
    case PathOf(base, parts) =>
      walk(eval(base, in, vars, defs), parts, in, vars, defs)
    case Var(name) =>
      vars.getOrElse(name,
        throw new IllegalArgumentException(s"unbound variable $$$name"))
    case Lit(v) => v
    case PipeOp(l, r) => eval(r, eval(l, in, vars, defs), vars, defs)
    case ObjCons(lets, fields, spread) =>
      val scope = lets.foldLeft(vars) { case (vs, (n, e)) =>
        vs + (n -> eval(e, in, vs, defs))
      }
      val o = Js.obj()
      val listed = mutable.Set[String]()
      fields.foreach { case (ke, e) =>
        val k = eval(ke, in, scope, defs).asText()
        listed += k
        val v = eval(e, in, scope, defs)
        // JSLT omits null-valued pairs: `"k": null` + `* : .` deletes k
        if (v != null && !v.isNull) o.set[JsonNode](k, v)
      }
      spread.foreach { case (minus, body) =>
        if (in != null && in.isObject)
          Js.fields(in).foreach { case (k, v) =>
            if (!listed.contains(k) && !minus.contains(k) && !o.has(k)) {
              // the matcher expression runs per key with `.` = its value
              val mv = eval(body, v, scope, defs)
              if (mv != null && !mv.isNull) o.set[JsonNode](k, mv)
            }
          }
      }
      o
    case CallFn(ns, name, args) =>
      val key = ns.map(n => s"$n:$name").getOrElse(name)
      defs.get(key) match {
        case Some(fn) =>
          val bound = fn.params.zip(args.map(eval(_, in, vars, defs))).toMap
          eval(fn.body, in, bound, defs)
        case None => builtinFn(key, args.map(eval(_, in, vars, defs)))
      }
    case ArrLit(items) =>
      val a = Js.arr()
      items.foreach(e => a.add(eval(e, in, vars, defs)))
      a
    case ArrFor(src, body, cond) =>
      val a = Js.arr()
      val seq = eval(src, in, vars, defs)
      val items =
        if (seq.isArray) Js.elems(seq)
        else if (seq.isObject) Js.fields(seq).map { case (k, v) =>
          val e = Js.obj(); e.put("key", k); e.set[JsonNode]("value", v); e
        }
        else Nil
      items.foreach { e =>
        val keep = cond.forall(c => truthy(eval(c, e, vars, defs)))
        if (keep) {
          val v = eval(body, e, vars, defs)
          if (v != null && !v.isNull) a.add(v) else a.add(NullNode.getInstance)
        }
      }
      a
    case ObjFor(src, key, value, cond) =>
      val o = Js.obj()
      val seq = eval(src, in, vars, defs)
      val items =
        if (seq.isArray) Js.elems(seq)
        else if (seq.isObject) Js.fields(seq).map { case (k, v) =>
          val e = Js.obj(); e.put("key", k); e.set[JsonNode]("value", v); e
        }
        else Nil
      items.foreach { e =>
        val keep = cond.forall(c => truthy(eval(c, e, vars, defs)))
        if (keep) {
          val k = eval(key, e, vars, defs)
          val v = eval(value, e, vars, defs)
          if (!v.isNull) o.set[JsonNode](k.asText(), v)
        }
      }
      o
    case IfE(cond, thn, els) =>
      if (truthy(eval(cond, in, vars, defs))) eval(thn, in, vars, defs)
      else eval(els, in, vars, defs)
    case BinOp("and", l, r) => // JSLT boolean() truthiness, short-circuit
      if (!truthy(eval(l, in, vars, defs))) BooleanNode.FALSE
      else BooleanNode.valueOf(truthy(eval(r, in, vars, defs)))
    case BinOp("or", l, r) =>
      if (truthy(eval(l, in, vars, defs))) BooleanNode.TRUE
      else BooleanNode.valueOf(truthy(eval(r, in, vars, defs)))
    case BinOp(op, l, r) =>
      numericOp(op, eval(l, in, vars, defs), eval(r, in, vars, defs))
  }

  /** JSLT boolean(): null, false, 0, empty collection/string are false. */
  private def truthy(a: JsonNode): Boolean =
    !(a == null || a.isNull ||
      (a.isBoolean && !a.asBoolean()) ||
      (a.isNumber && a.asDouble() == 0.0) ||
      ((a.isArray || a.isObject) && a.size() == 0) ||
      (a.isTextual && a.asText().isEmpty))

  /** Resolve path steps; dynamic indexes and slice bounds evaluate against
    * the step ROOT input (`root`), like JSLT's `[ <expr> ]`.
    */
  private def walk(start: JsonNode, parts: List[Step], root: JsonNode,
      vars: Map[String, JsonNode], defs: Map[String, FnDef]): JsonNode =
    parts.foldLeft(start) { (n, p) =>
      if (n == null || n.isNull) NullNode.getInstance
      else p match {
        case Field(f) => Option(n.get(f)).getOrElse(NullNode.getInstance)
        case Index(i) =>
          val at = if (i < 0) n.size() + i else i
          Option(n.get(at)).getOrElse(NullNode.getInstance)
        case DynIdx(e) =>
          val idx = eval(e, root, vars, defs)
          if (idx.isNumber) {
            val i = idx.asInt()
            val at = if (i < 0) n.size() + i else i
            Option(n.get(at)).getOrElse(NullNode.getInstance)
          } else Option(n.get(idx.asText())).getOrElse(NullNode.getInstance)
        case SliceStep(fromE, toE) =>
          val len = if (n.isTextual) n.asText().length else n.size()
          def bound(e: Option[Ast], dflt: Int): Int =
            e.map(x => eval(x, root, vars, defs).asInt()).getOrElse(dflt)
          def clamp(i: Int) =
            math.max(0, math.min(len, if (i < 0) len + i else i))
          val lo = clamp(bound(fromE, 0))
          val hi = math.max(lo, clamp(bound(toE, len)))
          if (n.isTextual) TextNode.valueOf(n.asText().substring(lo, hi))
          else Js.mkArr((lo until hi).map(n.get))
      }
    }

  /** The JSLT standard-library subset scripts lean on. */
  private def builtinFn(name: String, args: Seq[JsonNode]): JsonNode =
    name match {
      case "size" =>
        val a = args.head
        LongNode.valueOf(
          if (a == null || a.isNull) 0L
          else if (a.isTextual) a.asText().length.toLong
          else a.size().toLong)
      case "string" =>
        TextNode.valueOf(
          if (args.head.isTextual) args.head.asText()
          else Js.render(args.head))
      case "number" =>
        val a = args.head
        if (a.isNumber) a
        else if (a.isTextual)
          try LongNode.valueOf(a.asText().toLong)
          catch {
            case _: NumberFormatException =>
              try DoubleNode.valueOf(a.asText().toDouble)
              catch { case _: NumberFormatException => NullNode.getInstance }
          }
        else NullNode.getInstance
      case "boolean" => BooleanNode.valueOf(truthy(args.head))
      case "not" =>
        builtinFn("boolean", args) match {
          case b: BooleanNode => BooleanNode.valueOf(!b.asBoolean())
          case other          => other
        }
      case "contains" =>
        val (el, coll) = (args.head, args(1))
        // numeric nodes compare by value (LongNode(2) != IntNode(2) in
        // Jackson object equality)
        def same(a: JsonNode, b: JsonNode) =
          a == b || (a.isNumber && b.isNumber && a.asDouble() == b.asDouble())
        BooleanNode.valueOf(
          if (coll.isArray) Js.elems(coll).exists(same(_, el))
          else if (coll.isObject) el.isTextual && coll.has(el.asText())
          else if (coll.isTextual && el.isTextual)
            coll.asText().contains(el.asText())
          else false)
      case "join" =>
        val sep = if (args.size > 1) args(1).asText() else ""
        TextNode.valueOf(Js.elems(args.head)
          .map(e => if (e.isTextual) e.asText() else Js.render(e))
          .mkString(sep))
      case "lowercase" => TextNode.valueOf(args.head.asText().toLowerCase)
      case "uppercase" => TextNode.valueOf(args.head.asText().toUpperCase)
      case "is-object" => BooleanNode.valueOf(args.head.isObject)
      case "is-array"  => BooleanNode.valueOf(args.head.isArray)
      case "is-string" => BooleanNode.valueOf(args.head.isTextual)
      case "is-number" => BooleanNode.valueOf(args.head.isNumber)
      case "fallback" =>
        args.find(a => a != null && !a.isNull).getOrElse(NullNode.getInstance)
      case "test" =>
        BooleanNode.valueOf(
          java.util.regex.Pattern.compile(args(1).asText())
            .matcher(args.head.asText()).find())
      case "capture" => // named groups -> object
        val p = java.util.regex.Pattern.compile(args(1).asText())
        val m = p.matcher(args.head.asText())
        val o = Js.obj()
        if (m.find()) {
          val names = "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r
            .findAllMatchIn(args(1).asText()).map(_.group(1))
          names.foreach(n => Option(m.group(n)).foreach(v => o.put(n, v)))
        }
        o
      case "replace" =>
        TextNode.valueOf(
          args.head.asText().replaceAll(args(1).asText(), args(2).asText()))
      case "split" =>
        val a = Js.arr()
        args.head.asText().split(args(1).asText(), -1).foreach(a.add)
        a
      case "trim" => TextNode.valueOf(args.head.asText().trim)

      // ---- rest of the public JSLT standard library ----
      case "is-boolean" => BooleanNode.valueOf(args.head.isBoolean)
      case "is-integer" => BooleanNode.valueOf(args.head.isIntegralNumber)
      case "is-decimal" => BooleanNode.valueOf(
        args.head.isNumber && !args.head.isIntegralNumber)
      case "round" =>
        if (args.head.isNull) NullNode.getInstance
        else LongNode.valueOf(math.round(args.head.asDouble()))
      case "floor" =>
        if (args.head.isNull) NullNode.getInstance
        else LongNode.valueOf(math.floor(args.head.asDouble()).toLong)
      case "ceiling" =>
        if (args.head.isNull) NullNode.getInstance
        else LongNode.valueOf(math.ceil(args.head.asDouble()).toLong)
      case "random" =>
        DoubleNode.valueOf(
          java.util.concurrent.ThreadLocalRandom.current().nextDouble())
      case "sum" =>
        if (args.head.isNull) NullNode.getInstance
        else {
          val es = Js.elems(args.head)
          require(es.forall(_.isNumber), "sum() over non-numbers")
          if (es.forall(_.isIntegralNumber))
            LongNode.valueOf(es.map(_.asLong()).sum)
          else DoubleNode.valueOf(es.map(_.asDouble()).sum)
        }
      case "mod" => // mathematical modulo: result has the divisor's sign
        LongNode.valueOf(
          java.lang.Math.floorMod(args.head.asLong(), args(1).asLong()))
      case "hash-int" => // deterministic int hash of the json value
        LongNode.valueOf(canonical(args.head).hashCode.toLong)
      case "sha256-hex" =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest((if (args.head.isTextual) args.head.asText()
          else Js.render(args.head))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        TextNode.valueOf(digest.map(b => f"${b & 0xff}%02x").mkString)
      case "starts-with" =>
        BooleanNode.valueOf(
          args.head.isTextual &&
            args.head.asText().startsWith(args(1).asText()))
      case "ends-with" =>
        BooleanNode.valueOf(
          args.head.isTextual &&
            args.head.asText().endsWith(args(1).asText()))
      case "from-json" =>
        try Js.parse(args.head.asText())
        catch {
          case _: Exception =>
            if (args.size > 1) args(1) else NullNode.getInstance
        }
      case "to-json" => TextNode.valueOf(Js.render(args.head))
      case "min" | "max" => // two-value form (JSLT), null propagates
        val (a, b) = (args.head, args(1))
        if (a.isNull || b.isNull) NullNode.getInstance
        else {
          val c =
            if (a.isNumber && b.isNumber)
              java.lang.Double.compare(a.asDouble(), b.asDouble())
            else a.asText().compareTo(b.asText())
          if ((name == "min") == (c <= 0)) a else b
        }
      case "error" =>
        throw new IllegalArgumentException(args.head.asText())
      case "get-key" =>
        val v = Option(args.head.get(args(1).asText()))
          .getOrElse(NullNode.getInstance)
        if (v.isNull && args.size > 2) args(2) else v
      case "array" =>
        val a = args.head
        if (a.isNull || a.isArray) a
        else if (a.isObject)
          Js.mkArr(Js.fields(a).map { case (k, v) =>
            val e = Js.obj()
            e.put("key", k); e.set[JsonNode]("value", v); e: JsonNode
          })
        else throw new IllegalArgumentException(s"array() of $a")
      case "flatten" => // fully recursive, like JSLT
        def flat(n: JsonNode): Seq[JsonNode] =
          Js.elems(n).flatMap(e => if (e.isArray) flat(e) else Seq(e))
        if (args.head.isNull) NullNode.getInstance
        else Js.mkArr(flat(args.head))
      case "all" =>
        if (args.head.isNull) NullNode.getInstance
        else BooleanNode.valueOf(Js.elems(args.head).forall(e =>
          !(e.isNull || (e.isBoolean && !e.asBoolean()))))
      case "any" =>
        if (args.head.isNull) NullNode.getInstance
        else BooleanNode.valueOf(Js.elems(args.head).exists(e =>
          !(e.isNull || (e.isBoolean && !e.asBoolean()))))
      case "zip" =>
        if (args.head.isNull || args(1).isNull) NullNode.getInstance
        else Js.mkArr(Js.elems(args.head).zip(Js.elems(args(1)))
          .map { case (a, b) => Js.mkArr(Seq(a, b)): JsonNode })
      case "zip-with-index" =>
        if (args.head.isNull) NullNode.getInstance
        else Js.mkArr(Js.elems(args.head).zipWithIndex.map { case (e, i) =>
          Js.mkArr(Seq(e, LongNode.valueOf(i.toLong))): JsonNode
        })
      case "index-of" =>
        if (args.head.isNull) NullNode.getInstance
        else LongNode.valueOf(Js.elems(args.head).indexWhere(e =>
          e == args(1) || (e.isNumber && args(1).isNumber &&
            e.asDouble() == args(1).asDouble())).toLong)
      case "now" =>
        DoubleNode.valueOf(System.currentTimeMillis() / 1000.0)
      case "parse-time" => // (time, format[, fallback]) -> epoch seconds;
        // SimpleDateFormat semantics like public JSLT: missing fields
        // (date-only patterns) default instead of failing
        try {
          val fmt = new java.text.SimpleDateFormat(
            args(1).asText(), java.util.Locale.ENGLISH)
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
          fmt.setLenient(false)
          val ms = fmt.parse(args.head.asText()).getTime
          if (ms % 1000 == 0) LongNode.valueOf(ms / 1000)
          else DoubleNode.valueOf(ms / 1000.0)
        } catch {
          case _: Exception =>
            if (args.size > 2) args(2)
            else throw new IllegalArgumentException(
              s"parse-time: cannot parse '${args.head.asText()}'")
        }
      case "format-time" => // (epoch-seconds, format[, timezone])
        val zone =
          if (args.size > 2) java.time.ZoneId.of(args(2).asText())
          else java.time.ZoneOffset.UTC
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern(args(1).asText(), java.util.Locale.ENGLISH)
          .withZone(zone)
        val secs = args.head.asDouble()
        TextNode.valueOf(fmt.format(
          java.time.Instant.ofEpochMilli(math.round(secs * 1000))))
      case "parse-url" =>
        val u = new java.net.URI(args.head.asText())
        val o = Js.obj()
        def put(k: String, v: String): Unit =
          if (v != null) o.put(k, v)
        put("scheme", u.getScheme)
        put("userinfo", u.getUserInfo)
        put("host", u.getHost)
        if (u.getPort >= 0) o.put("port", u.getPort)
        put("path", if (u.getPath != null && u.getPath.isEmpty) null
        else u.getPath)
        put("query", u.getRawQuery)
        put("fragment", u.getFragment)
        if (u.getRawQuery != null) {
          val params = Js.obj()
          u.getRawQuery.split("&").filter(_.nonEmpty).foreach { kv =>
            val eq = kv.indexOf('=')
            val (k, v) =
              if (eq < 0) (kv, NullNode.getInstance: JsonNode)
              else (kv.substring(0, eq),
                TextNode.valueOf(java.net.URLDecoder
                  .decode(kv.substring(eq + 1), "UTF-8")): JsonNode)
            val key = java.net.URLDecoder.decode(k, "UTF-8")
            val arr = Option(params.get(key)).collect {
              case a: com.fasterxml.jackson.databind.node.ArrayNode => a
            }.getOrElse {
              val a = Js.arr(); params.set[JsonNode](key, a); a
            }
            arr.add(v)
          }
          o.set[JsonNode]("parameters", params)
        }
        o

      // ---- the reference's custom function set (docs/custom_jslt.md) ----
      case "base64-encode" =>
        TextNode.valueOf(java.util.Base64.getEncoder
          .encodeToString(args.head.asText()
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case "base64-decode" =>
        TextNode.valueOf(new String(
          java.util.Base64.getDecoder.decode(args.head.asText()),
          java.nio.charset.StandardCharsets.UTF_8))
      case "uri-encode" => // URI %-encoding (URLEncoder is form-encoding:
        // '+' for space — URIs want %20)
        TextNode.valueOf(java.net.URLEncoder
          .encode(args.head.asText(), "UTF-8").replace("+", "%20"))
      case "uri-decode" =>
        TextNode.valueOf(
          java.net.URLDecoder.decode(args.head.asText(), "UTF-8"))
      case "uuid" =>
        TextNode.valueOf(java.util.UUID.randomUUID().toString)
      case "substr" =>
        val s = args.head.asText()
        val from = args(1).asInt()
        val to = if (args.size > 2) args(2).asInt() else s.length
        TextNode.valueOf(s.substring(from, to))
      case "parse-iso-instant" => // ISO 8601 timestamp -> epoch SECONDS
        try LongNode.valueOf(
          java.time.Instant.parse(args.head.asText()).getEpochSecond)
        catch { case _: Exception => NullNode.getInstance }
      case "pointer" => // combine the arguments into one RFC 6901 pointer
        TextNode.valueOf(args.map(a =>
          "/" + escapePointer(
            if (a.isTextual) a.asText() else Js.render(a))).mkString)
      case "get-pointer" =>
        val v = args.head.at(args(1).asText())
        if (v.isMissingNode)
          (if (args.size > 2) args(2) else NullNode.getInstance) else v
      case "set-pointer" =>
        setPointer(args.head, args(1).asText(), args(2))
      case "trace" => // identity with a log side effect (reference traces
        // to the app logger, Context.java:75)
        graft.op.LogSink.jslt("graft.jslt", "INFO",
          "'" + Js.render(args.head) + "'", null, null, null)
        args.head

      case other => // plugin-provided functions (docs/plugins.md) — resolved
        // at eval time so executor-side UDFs see classpath plugins too
        graft.plugin.Plugins.jsltFunction(other)
          .map(f => f(args))
          .getOrElse(
            throw new IllegalArgumentException(s"undefined function $other"))
    }

  /** Key-order-independent rendering, so hash-int is deterministic. */
  private def canonical(n: JsonNode): String =
    if (n.isObject)
      Js.fields(n).sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + canonical(v) }
        .mkString("{", ",", "}")
    else if (n.isArray) Js.elems(n).map(canonical).mkString("[", ",", "]")
    else Js.render(n)

  private def escapePointer(seg: String): String =
    seg.replace("~", "~0").replace("/", "~1")

  /** RFC 6901 set: returns a NEW document with `value` at `ptr`; missing
    * intermediate objects are created, array segments must resolve ("-"
    * appends).
    */
  private def setPointer(root: JsonNode, ptr: String, value: JsonNode)
      : JsonNode = {
    import com.fasterxml.jackson.databind.node.ArrayNode
    if (ptr.isEmpty) return value
    val segs = ptr.split("/", -1).drop(1)
      .map(_.replace("~1", "/").replace("~0", "~")).toList
    val copy = root.deepCopy[JsonNode]()
    var cur: JsonNode = copy
    segs.init.foreach { s =>
      cur = cur match {
        case o: ObjectNode =>
          if (!o.has(s) || !o.get(s).isContainerNode)
            o.set[JsonNode](s, Js.obj())
          o.get(s)
        case a: ArrayNode => a.get(s.toInt)
        case other =>
          throw new IllegalArgumentException(s"set-pointer through $other")
      }
    }
    (cur, segs.last) match {
      case (o: ObjectNode, k) => o.set[JsonNode](k, value)
      case (a: ArrayNode, "-") => a.add(value)
      case (a: ArrayNode, i)  => a.set(i.toInt, value)
      case (other, _) =>
        throw new IllegalArgumentException(s"set-pointer into $other")
    }
    copy
  }

  private def numericOp(op: String, a: JsonNode, b: JsonNode): JsonNode =
    if (cmpOps(op)) {
      val c =
        if (a.isNumber && b.isNumber)
          java.lang.Double.compare(a.asDouble(), b.asDouble())
        else if (a.isTextual && b.isTextual) a.asText().compareTo(b.asText())
        else if (a == b) 0
        else a.toString.compareTo(b.toString)
      BooleanNode.valueOf(op match {
        case "==" => c == 0
        case "!=" => c != 0
        case "<"  => c < 0
        case ">"  => c > 0
        case "<=" => c <= 0
        case ">=" => c >= 0
      })
    } else if (a.isTextual || b.isTextual) {
      require(op == "+", s"cannot $op strings")
      TextNode.valueOf(
        (if (a.isTextual) a.asText() else Js.render(a)) +
          (if (b.isTextual) b.asText() else Js.render(b)))
    } else if (a.isArray && b.isArray && op == "+") { // array concat
      Js.mkArr(Js.elems(a) ++ Js.elems(b))
    } else if (a.isObject && b.isObject && op == "+") {
      val merged = a.deepCopy[ObjectNode]()
      Js.fields(b).foreach { case (k, v) => merged.set[JsonNode](k, v) }
      merged
    } else {
      val exact = a.isIntegralNumber && b.isIntegralNumber && op != "/"
      op match {
        case "+" => if (exact) LongNode.valueOf(a.asLong() + b.asLong())
        else DoubleNode.valueOf(a.asDouble() + b.asDouble())
        case "-" => if (exact) LongNode.valueOf(a.asLong() - b.asLong())
        else DoubleNode.valueOf(a.asDouble() - b.asDouble())
        case "*" => if (exact) LongNode.valueOf(a.asLong() * b.asLong())
        else DoubleNode.valueOf(a.asDouble() * b.asDouble())
        case "/" => DoubleNode.valueOf(a.asDouble() / b.asDouble())
      }
    }

  private final class Tok(script: String) {
    private val tokens: Vector[String] = {
      val out = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < script.length) {
        val c = script(i)
        if (c.isWhitespace) i += 1
        else if (c == '/' && i + 1 < script.length && script(i + 1) == '/') {
          while (i < script.length && script(i) != '\n') i += 1
        } else if (c == '"') {
          val (tok, after) = MiniJq.Tokens.stringToken(script, i)
          out += tok; i = after
        } else if (c.isLetter || c == '_') {
          val start = i
          // hyphenated identifiers (.other-nested, reference app36): a '-'
          // glues only when directly followed by a LETTER — `.value-1`
          // stays subtraction (real JSLT has no hyphens in identifiers;
          // this admits the fixtures' hyphenated keys without stealing
          // adjacent numeric subtraction)
          while (i < script.length &&
            (script(i).isLetterOrDigit || script(i) == '_' ||
              (script(i) == '-' && i + 1 < script.length &&
                script(i + 1).isLetter))) i += 1
          out += script.substring(start, i)
        } else if (c.isDigit) {
          val start = i
          while (i < script.length &&
            (script(i).isDigit || script(i) == '.')) i += 1
          out += script.substring(start, i)
        } else if ("=!<>".contains(c) && i + 1 < script.length &&
          script(i + 1) == '=') {
          out += script.substring(i, i + 2); i += 2
        } else { out += c.toString; i += 1 }
      }
      out.toVector
    }
    private var pos = 0
    def peek: String = if (pos < tokens.length) tokens(pos) else null
    def peekIs(s: String): Boolean = peek == s
    def peekWord: Boolean =
      peek != null && (peek.head.isLetter || peek.head == '_')
    def peekAfterIs(w: String): Boolean =
      pos + 1 < tokens.length && tokens(pos + 1) == w
    def peekWordAfterDot: Boolean =
      pos + 1 < tokens.length &&
        (tokens(pos + 1).head.isLetter || tokens(pos + 1).head == '_')
    def peekStringAfterDot: Boolean =
      pos + 1 < tokens.length && tokens(pos + 1).head == '"'
    def peekString: Boolean = peek != null && peek.head == '"'
    def next(): String = { val t = peek; pos += 1; t }
    def expect(s: String): Unit =
      require(next() == s, s"expected '$s'")
    def expectWord(s: String): Unit = expect(s)
    def word(): String = {
      val t = next()
      require(t != null && (t.head.isLetter || t.head == '_'),
        s"expected identifier, found '$t'")
      t
    }
    def string(): String = {
      val t = next()
      require(t.head == '"', s"expected string, found '$t'")
      t.substring(1) // token = leading quote + already-unescaped content
    }
  }
}
