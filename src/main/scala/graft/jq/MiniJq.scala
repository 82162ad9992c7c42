package graft.jq

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, DoubleNode, LongNode, NullNode, ObjectNode, TextNode, BooleanNode}
import graft.json.Js
import scala.collection.mutable

/** A small JQ interpreter covering the subset the reference's applications
  * use for reducers and `$jq` stages (docs/aggregation_stages.md:245-260,
  * fixture scripts under src/test/resources/app38..app39): paths, pipes,
  * arithmetic (with JQ's object-merge `+`), object/array construction,
  * `del(...)`, zero-argument `def` filters, and `import ... as ns;`.
  *
  * This is an independent implementation of the public JQ language subset,
  * not a port of any JQ engine.
  */
object MiniJq {

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step
  case object IterateStep extends Step // `[]`: stream the elements/values
  final case class Slice(from: Option[Int], to: Option[Int]) extends Step

  sealed trait Ast
  case object Identity extends Ast
  final case class Path(parts: List[Step]) extends Ast
  final case class Lit(value: JsonNode) extends Ast
  final case class Pipe(stages: List[Ast]) extends Ast
  final case class Comma(items: List[Ast]) extends Ast
  final case class BinOp(op: String, l: Ast, r: Ast) extends Ast
  // keys are expressions (plain identifiers become string literals) so
  // `{(.k): v}` computed keys and `{a, $x}` shorthand both fit
  final case class ObjCons(fields: List[(Ast, Ast)]) extends Ast
  final case class ArrCons(items: List[Ast]) extends Ast
  final case class Del(target: Ast) extends Ast
  // `.a = v`, `.a |= f`, `.a += v` … — lhs must be a path expression
  final case class AssignOp(op: String, lhs: Ast, rhs: Ast) extends Ast
  final case class Call(ns: Option[String], name: String,
      args: List[Ast] = Nil) extends Ast
  final case class IfElse(cond: Ast, thn: Ast, els: Ast) extends Ast
  final case class StrInterp(parts: List[Either[String, Ast]]) extends Ast
  final case class VarRef(name: String) extends Ast
  /** Destructuring patterns for `EXPR as PAT | REST`. */
  sealed trait Pat
  final case class PVar(name: String) extends Pat
  final case class PArr(items: List[Pat]) extends Pat
  // object keys may be literal names or `$shorthand` (binds the same-named
  // field); values are nested patterns
  final case class PObj(fields: List[(String, Pat)]) extends Pat

  final case class Bind(src: Ast, pattern: Pat, rest: Ast) extends Ast
  /** `label $name | body` / `break $name`: early stream termination. */
  final case class Label(name: String, body: Ast) extends Ast
  final case class Break(name: String) extends Ast
  final case class Reduce(src: Ast, name: String, init: Ast, update: Ast)
      extends Ast
  final case class Foreach(src: Ast, name: String, init: Ast, update: Ast,
      extract: Option[Ast]) extends Ast
  final case class TryOp(body: Ast, handler: Option[Ast]) extends Ast

  final case class FnDef(params: List[String], body: Ast)
  final case class Program(defs: Map[String, FnDef], body: Ast)

  /** Compile a script; `load` resolves import paths to script text.
    * `base` is the app-root-relative path of this script, so nested
    * imports resolve against its directory.
    */
  def compile(script: String,
      load: String => String = f =>
        throw new IllegalArgumentException(s"no script loader for $f"),
      base: String = ""): JsonNode => JsonNode = {
    val all = compileAll(script, load, base)
    input => all(input).headOption.getOrElse(NullNode.getInstance)
  }

  /** JQ filters are streams: every expression may yield 0..n outputs
    * (`.[]` iterates, `,` concatenates, `[...]` collects). */
  def compileAll(script: String,
      load: String => String = f =>
        throw new IllegalArgumentException(s"no script loader for $f"),
      base: String = ""): JsonNode => Seq[JsonNode] = {
    val prog = parse(script, load, base)
    input =>
      try eval(prog.body, input, prog.defs, Map.empty)
      catch {
        // `halt` stops the program, keeping outputs already emitted
        case b: BreakEx if b.label == HaltLabel => b.outputs
        case b: BreakEx => throw new IllegalArgumentException(
          s"break without a matching label $$${b.label}")
      }
  }

  // -- parser ---------------------------------------------------------------

  private def parse(script: String, load: String => String,
      base: String = ""): Program = {
    val t = new Tokens(script)
    val defs = mutable.Map[String, FnDef]()
    var more = true
    while (more) {
      if (t.peekIs("import")) {
        t.expect("import")
        val file = t.string()
        t.expect("as"); val ns = t.ident(); t.expect(";")
        val full = graft.json.Js.relativeTo(base, file)
        val imported = parse(load(full), load, full)
        imported.defs.foreach { case (k, v) => defs(s"$ns::$k") = v }
      } else if (t.peekIs("def")) {
        t.expect("def")
        val name = t.ident()
        val params = mutable.ListBuffer[String]()
        if (t.peekIs("(")) { // def f(a; b): ... — params are filters
          t.next()
          while (!t.peekIs(")")) {
            params += t.ident(); if (t.peekIs(";")) t.next()
          }
          t.expect(")")
        }
        t.expect(":")
        val body = parseExpr(t)
        t.expect(";")
        defs(name) = FnDef(params.toList, body)
      } else more = false
    }
    // defs-only scripts (imported libraries) have no body
    val body = if (t.peek == null) Identity else parseExpr(t)
    // anything left over is a silent-truncation bug waiting to happen
    // (jq rejects e.g. chained `=`: '.a = .b = 1' must not parse as
    // '.a = .b' and drop the tail)
    require(t.peek == null, s"unexpected token '${t.peek}' after program")
    Program(defs.toMap, body)
  }

  private def parseExpr(t: Tokens): Ast = {
    val head = parseComma(t)
    if (t.peekIs("as")) { // EXPR as PAT | REST — binds each output of EXPR
      t.expect("as")
      val pat = parsePattern(t)
      t.expect("|")
      Bind(head, pat, parseExpr(t))
    } else {
      val stages = mutable.ListBuffer(head)
      while (t.peekIs("|")) { t.expect("|"); stages += parseComma(t) }
      if (stages.size == 1) stages.head else Pipe(stages.toList)
    }
  }

  /** `$x`, `[$a, $b]`, `{name: $n, $short, nested: [$v]}`. */
  private def parsePattern(t: Tokens): Pat =
    if (t.peekIs("$")) { t.next(); PVar(t.ident()) }
    else if (t.peekIs("[")) {
      t.next()
      val items = mutable.ListBuffer[Pat]()
      while (!t.peekIs("]")) {
        items += parsePattern(t); if (t.peekIs(",")) t.next()
      }
      t.expect("]")
      PArr(items.toList)
    } else if (t.peekIs("{")) {
      t.next()
      val fields = mutable.ListBuffer[(String, Pat)]()
      while (!t.peekIs("}")) {
        if (t.peekIs("$")) { // {$x} == {x: $x}
          t.next()
          val n = t.ident()
          fields += n -> PVar(n)
        } else {
          val key = if (t.peekString) t.string() else t.ident()
          t.expect(":")
          fields += key -> parsePattern(t)
        }
        if (t.peekIs(",")) t.next()
      }
      t.expect("}")
      PObj(fields.toList)
    } else throw new IllegalArgumentException(
      s"expected pattern after 'as', found '${t.peek}'")

  /** Walk a pattern against a value, binding every `$var` it names. */
  private def bindPattern(p: Pat, v: JsonNode,
      vars: Map[String, JsonNode]): Map[String, JsonNode] = p match {
    case PVar(n) => vars + (n -> v)
    case PArr(items) =>
      items.zipWithIndex.foldLeft(vars) { case (vs, (pat, i)) =>
        val e = if (v != null && v.isArray && i < v.size()) v.get(i)
          else NullNode.getInstance
        bindPattern(pat, e, vs)
      }
    case PObj(fields) =>
      fields.foldLeft(vars) { case (vs, (k, pat)) =>
        val e = if (v != null && v.isObject)
          Option(v.get(k)).getOrElse(NullNode.getInstance)
        else NullNode.getInstance
        bindPattern(pat, e, vs)
      }
  }

  /** `,` concatenates output streams; binds tighter than `|`. */
  private def parseComma(t: Tokens): Ast = {
    val items = mutable.ListBuffer(parseAlt(t))
    while (t.peekIs(",")) { t.expect(","); items += parseAlt(t) }
    if (items.size == 1) items.head else Comma(items.toList)
  }

  /** `l // r`: the truthy outputs of l, else r. */
  private def parseAlt(t: Tokens): Ast = {
    var l = parseAssign(t)
    while (t.peekIs("//")) { t.next(); l = BinOp("//", l, parseAssign(t)) }
    l
  }

  private val assignOps =
    Set("=", "|=", "+=", "-=", "*=", "/=", "%=", "//=")

  /** jq's `=` family is nonassoc, between `//` and `or`. */
  private def parseAssign(t: Tokens): Ast = {
    val l = parseOr(t)
    if (t.peek != null && assignOps(t.peek)) {
      val op = t.next()
      AssignOp(op, l, parseOr(t))
    } else l
  }

  private def parseOr(t: Tokens): Ast = {
    var l = parseAnd(t)
    while (t.peekIs("or")) { t.next(); l = BinOp("or", l, parseAnd(t)) }
    l
  }

  private def parseAnd(t: Tokens): Ast = {
    var l = parseCmp(t)
    while (t.peekIs("and")) { t.next(); l = BinOp("and", l, parseCmp(t)) }
    l
  }

  private val cmpOps = Set("==", "!=", "<", ">", "<=", ">=")

  private def parseCmp(t: Tokens): Ast = {
    val l = parseAdd(t)
    if (t.peek != null && cmpOps(t.peek)) {
      val op = t.next()
      BinOp(op, l, parseAdd(t))
    } else l
  }

  private def parseAdd(t: Tokens): Ast = {
    var l = parseMul(t)
    while (t.peekIs("+") || t.peekIs("-")) {
      val op = t.next()
      l = BinOp(op, l, parseMul(t))
    }
    l
  }

  private def parseMul(t: Tokens): Ast = {
    var l = parsePostfix(t)
    while (t.peekIs("*") || t.peekIs("/") || t.peekIs("%")) {
      val op = t.next()
      l = BinOp(op, l, parsePostfix(t))
    }
    l
  }

  /** `EXPR?` suppresses errors, like `try EXPR`; `EXPR.field` / `EXPR[...]`
    * navigate into any expression's output (`match(re).captures[0]`).
    */
  private def parsePostfix(t: Tokens): Ast = {
    var l = parsePrimary(t)
    var more = true
    while (more) {
      if (t.peekIs("?")) { t.next(); l = TryOp(l, None) }
      else if (t.peekIs(".") && {
        t.mark(); t.next(); val ok = t.peekIdent || t.peekString; t.reset(); ok
      }) {
        t.next()
        l = Pipe(List(l, Path(parseSteps(t, leadIdent = true))))
      } else if (t.peekIs("["))
        l = Pipe(List(l, Path(parseSteps(t, leadIdent = false))))
      else more = false
    }
    l
  }

  /** `.a.b[0][].c` after the leading dot: fields, indexes (negative too),
    * string indexes (`.["a b"]`), slices (`.[2:5]`, `.[:3]`, `.[-2:]`)
    * and iterations.
    */
  private def parseSteps(t: Tokens, leadIdent: Boolean): List[Step] = {
    val parts = mutable.ListBuffer.empty[Step]
    if (leadIdent)
      parts += Field(if (t.peekString) t.string() else t.ident())
    def int(): Int = {
      val neg = t.peekIs("-")
      if (neg) t.next()
      val n = t.next().toInt
      if (neg) -n else n
    }
    var more = true
    while (more) {
      if (t.peekIs("[")) {
        t.next()
        if (t.peekIs("]")) { t.next(); parts += IterateStep }
        else if (t.peekString) { parts += Field(t.string()); t.expect("]") }
        else if (t.peekIs(":")) { // .[:n]
          t.next(); parts += Slice(None, Some(int())); t.expect("]")
        } else {
          val i = int()
          if (t.peekIs(":")) {
            t.next()
            val to = if (t.peekIs("]")) None else Some(int())
            parts += Slice(Some(i), to)
          } else parts += Index(i)
          t.expect("]")
        }
      } else if (t.peekIs(".") && { t.mark(); t.next(); val ok = t.peekIdent || t.peekString; t.reset(); ok }) {
        t.next()
        parts += Field(if (t.peekString) t.string() else t.ident())
      } else more = false
    }
    parts.toList
  }

  /** Object values parse below the comma level (JQ: `{a: 1, b: 2}` — the
    * comma separates pairs; parenthesize to stream inside a value).
    */
  private def parseObjVal(t: Tokens): Ast = {
    val stages = mutable.ListBuffer(parseAlt(t))
    while (t.peekIs("|")) { t.expect("|"); stages += parseAlt(t) }
    if (stages.size == 1) stages.head else Pipe(stages.toList)
  }

  private def parsePrimary(t: Tokens): Ast = t.peek match {
    case "." =>
      t.next()
      if (t.peekIdent || t.peekIs("[")) {
        val steps = parseSteps(t, leadIdent = t.peekIdent)
        if (steps.isEmpty) Identity else Path(steps)
      } else Identity
    case "{" =>
      t.next()
      val fields = mutable.ListBuffer[(Ast, Ast)]()
      while (!t.peekIs("}")) {
        if (t.peekIs("$")) { // {$x} == {x: $x}
          t.next()
          val v = t.ident()
          fields += Lit(TextNode.valueOf(v)) -> VarRef(v)
        } else if (t.peekIs("(")) { // {(expr): v} computed key
          t.next()
          val k = parseExpr(t)
          t.expect(")"); t.expect(":")
          fields += k -> parseObjVal(t)
        } else {
          val key = if (t.peekString) t.string() else t.ident()
          if (t.peekIs(":")) {
            t.next()
            fields += Lit(TextNode.valueOf(key)) -> parseObjVal(t)
          } else // {a} == {a: .a}
            fields += Lit(TextNode.valueOf(key)) -> Path(List(Field(key)))
        }
        if (t.peekIs(",")) t.next()
      }
      t.expect("}")
      ObjCons(fields.toList)
    case "[" => // [expr] COLLECTS every output of expr (JQ semantics)
      t.next()
      val items = mutable.ListBuffer[Ast]()
      while (!t.peekIs("]")) {
        items += parseExpr(t)
        if (t.peekIs(",")) t.next()
      }
      t.expect("]")
      ArrCons(items.toList)
    case "$" =>
      val loc = t.line
      t.next()
      val name = t.ident()
      // $__loc__ resolves at PARSE time to {file, line} (jq manual); it
      // takes postfix paths like any variable ($__loc__.file is valid jq)
      val v: Ast =
        if (name == "__loc__") {
          val o = Js.obj()
          o.put("file", "<stdin>"); o.put("line", loc)
          Lit(o)
        } else VarRef(name)
      // postfix path on a variable: $x.v, $x[0]
      if (t.peekIs(".") && { t.mark(); t.next(); val ok = t.peekIdent; t.reset(); ok }) {
        t.next()
        Pipe(List(v, Path(parseSteps(t, leadIdent = true))))
      } else if (t.peekIs("["))
        Pipe(List(v, Path(parseSteps(t, leadIdent = false))))
      else v
    case "label" => // label $name | BODY — break $name escapes to here
      t.next(); t.expect("$")
      val name = t.ident()
      t.expect("|")
      Label(name, parseExpr(t))
    case "break" =>
      t.next(); t.expect("$")
      Break(t.ident())
    case "reduce" => // reduce SRC as $x (INIT; UPDATE)
      t.next()
      val src = parseComma(t)
      t.expect("as"); t.expect("$")
      val name = t.ident()
      t.expect("(")
      val init = parseExpr(t)
      t.expect(";")
      val update = parseExpr(t)
      t.expect(")")
      Reduce(src, name, init, update)
    case "foreach" => // foreach SRC as $x (INIT; UPDATE[; EXTRACT])
      t.next()
      val src = parseComma(t)
      t.expect("as"); t.expect("$")
      val name = t.ident()
      t.expect("(")
      val init = parseExpr(t)
      t.expect(";")
      val update = parseExpr(t)
      val extract =
        if (t.peekIs(";")) { t.next(); Some(parseExpr(t)) } else None
      t.expect(")")
      Foreach(src, name, init, update, extract)
    case "try" => // try BODY [catch HANDLER]: errors become empty/handled
      t.next()
      val body = parsePrimary(t)
      val handler =
        if (t.peekIs("catch")) { t.next(); Some(parsePrimary(t)) } else None
      TryOp(body, handler)
    case "(" =>
      t.next(); val e = parseExpr(t); t.expect(")"); e
    case "if" =>
      t.next()
      def clause(): Ast = { // cond then BODY [elif…] [else BODY] end
        val cond = parseExpr(t)
        t.expect("then")
        val thn = parseExpr(t)
        val els =
          if (t.peekIs("elif")) { t.next(); clause() }
          else if (t.peekIs("else")) { t.next(); val e = parseExpr(t); t.expect("end"); e }
          else { t.expect("end"); Identity } // missing else: pass through
        IfElse(cond, thn, els)
      }
      clause()
    case "del" =>
      t.next(); t.expect("(")
      val target = parseExpr(t)
      t.expect(")")
      Del(target)
    case ".." => t.next(); Call(None, "recurse", Nil)
    case s if s != null && s.head == '@' => // @base64, @csv, … format filters
      t.next(); Call(None, s, Nil)
    case s if t.peekString =>
      val raw = t.string()
      if (!raw.contains('\u0000')) Lit(TextNode.valueOf(raw))
      else { // "a \(expr) b": parse each embedded expression
        val parts = mutable.ListBuffer[Either[String, Ast]]()
        var rest = raw
        while (rest.contains('\u0000')) {
          val at = rest.indexOf('\u0000')
          if (at > 0) parts += Left(rest.substring(0, at))
          // find the matching ')' for the '(' right after the marker
          var depth = 0
          var j = at + 1
          var end = -1
          while (end < 0 && j < rest.length) {
            rest(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) end = j
              case _   =>
            }
            j += 1
          }
          require(end > 0, "unterminated interpolation")
          val inner = rest.substring(at + 2, end)
          parts += Right(parse(inner, f =>
            throw new IllegalArgumentException("no loader in interpolation"),
            "").body)
          rest = rest.substring(end + 1)
        }
        if (rest.nonEmpty) parts += Left(rest)
        StrInterp(parts.toList)
      }
    case "-" => // unary minus: the tokenizer emits '-' standalone
      t.next()
      val n = t.next()
      require(n != null && n.nonEmpty && n.head.isDigit,
        s"expected number after '-', found '$n'")
      Lit(if (n.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
        DoubleNode.valueOf(-n.toDouble)
      else LongNode.valueOf(-n.toLong))
    case s if s != null && s.head.isDigit =>
      val n = t.next()
      Lit(if (n.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
        DoubleNode.valueOf(n.toDouble)
      else LongNode.valueOf(n.toLong))
    case "true"  => t.next(); Lit(BooleanNode.TRUE)
    case "false" => t.next(); Lit(BooleanNode.FALSE)
    case "null"  => t.next(); Lit(NullNode.getInstance)
    case _ =>
      val name = t.ident()
      val (ns, fn) =
        if (t.peekIs("::")) { t.next(); (Some(name), t.ident()) }
        else (None, name)
      val args = mutable.ListBuffer[Ast]()
      if (t.peekIs("(")) { // jq separates filter args with ';'
        t.next()
        while (!t.peekIs(")")) {
          args += parseExpr(t); if (t.peekIs(";")) t.next()
        }
        t.expect(")")
      }
      Call(ns, fn, args.toList)
  }

  // -- evaluator ------------------------------------------------------------
  // JQ filters are streams: each expression maps one input to 0..n
  // outputs. Pipe flat-maps, comma concatenates, binary operators and
  // object fields take the cartesian product of their operand streams,
  // and [expr] collects the whole stream into one array.

  /** `break $label` as control flow: carries the outputs the enclosing
    * stream fully produced before the break, so `label $o | 1,2,break $o`
    * yields 1,2. The stream combinators (pipe, comma, bind, foreach)
    * prepend their accumulated prefix and rethrow; `[...]`/`reduce` let it
    * abort them (jq: an incomplete collection emits nothing). NOT an
    * error — `try` must never swallow it.
    */
  private final class BreakEx(val label: String,
      var outputs: Seq[JsonNode])
      extends RuntimeException with scala.util.control.NoStackTrace

  /** Reserved label `halt` escapes to: compileAll returns its outputs. */
  private val HaltLabel = "__halt__"

  private lazy val envNode: JsonNode = {
    val o = Js.obj()
    sys.env.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    o
  }

  /** Pipe with break-aware prefix threading: outputs fully produced before
    * a `break` keep flowing through the remaining stages, so
    * `label $o | (1,2,break $o) | .*10` yields 10,20.
    */
  private def evalPipe(stages: List[Ast], inputs: Seq[JsonNode],
      defs: Map[String, FnDef], vars: Map[String, JsonNode])
      : Seq[JsonNode] = stages match {
    case Nil => inputs
    case s :: rest =>
      val out = Vector.newBuilder[JsonNode]
      val mapped =
        try { inputs.foreach(n => out ++= eval(s, n, defs, vars)); out.result() }
        catch {
          case b: BreakEx =>
            b.outputs = evalPipe(rest, out.result() ++ b.outputs, defs, vars)
            throw b
        }
      evalPipe(rest, mapped, defs, vars)
  }

  private def step(n: JsonNode, p: Step): Seq[JsonNode] = p match {
    case Field(f) =>
      if (n == null || n.isNull) Seq(NullNode.getInstance)
      else Seq(Option(n.get(f)).getOrElse(NullNode.getInstance))
    case Index(i) =>
      if (n == null || n.isNull) Seq(NullNode.getInstance)
      else {
        val at = if (i < 0) n.size() + i else i
        Seq(Option(n.get(at)).getOrElse(NullNode.getInstance))
      }
    case Slice(from, to) =>
      if (n == null || n.isNull) Seq(NullNode.getInstance)
      else {
        val len = if (n.isTextual) n.asText().length else n.size()
        def clamp(i: Int) = math.max(0, math.min(len, if (i < 0) len + i else i))
        val lo = clamp(from.getOrElse(0))
        val hi = math.max(lo, clamp(to.getOrElse(len)))
        if (n.isTextual) Seq(TextNode.valueOf(n.asText().substring(lo, hi)))
        else {
          val a = Js.arr()
          (lo until hi).foreach(i => a.add(n.get(i)))
          Seq(a)
        }
      }
    case IterateStep =>
      if (n == null || n.isNull) Seq.empty
      else if (n.isArray) Js.elems(n)
      else if (n.isObject) Js.fields(n).map(_._2)
      else Seq.empty
  }

  private def eval(ast: Ast, in: JsonNode, defs: Map[String, FnDef],
      vars: Map[String, JsonNode]): Seq[JsonNode] =
    ast match {
      case Identity => Seq(in)
      case Path(parts) =>
        parts.foldLeft(Seq(in))((ns, p) => ns.flatMap(step(_, p)))
      case Lit(v)       => Seq(v)
      case VarRef(name) =>
        Seq(vars.getOrElse(name,
          if (name == "ENV") envNode
          else throw new IllegalArgumentException(
            s"undefined variable $$$name")))
      case Label(name, body) =>
        try eval(body, in, defs, vars)
        catch { case b: BreakEx if b.label == name => b.outputs }
      case Break(name) => throw new BreakEx(name, Vector.empty)
      case Bind(src, pattern, rest) =>
        val srcVals = eval(src, in, defs, vars)
        val out = Vector.newBuilder[JsonNode]
        try {
          srcVals.foreach(v =>
            out ++= eval(rest, in, defs, bindPattern(pattern, v, vars)))
          out.result()
        } catch {
          case b: BreakEx =>
            b.outputs = out.result() ++ b.outputs; throw b
        }
      case Foreach(src, name, init, update, extract) =>
        eval(init, in, defs, vars).flatMap { init0 =>
          var acc = init0
          val out = Vector.newBuilder[JsonNode]
          try {
            eval(src, in, defs, vars).foreach { v =>
              val bound = vars + (name -> v)
              acc = eval(update, acc, defs, bound).lastOption
                .getOrElse(NullNode.getInstance)
              extract match {
                case Some(e) => out ++= eval(e, acc, defs, bound)
                case None    => out += acc
              }
            }
            out.result()
          } catch {
            case b: BreakEx =>
              b.outputs = out.result() ++ b.outputs; throw b
          }
        }
      case TryOp(body, handler) =>
        try eval(body, in, defs, vars)
        catch {
          case b: BreakEx => throw b // control flow, not an error
          case e: Exception =>
            handler match {
              case Some(h) =>
                eval(h, TextNode.valueOf(
                  Option(e.getMessage).getOrElse("error")), defs, vars)
              case None => Seq.empty
            }
        }
      case Reduce(src, name, init, update) =>
        // like ArrCons: a break aborts the fold, nothing partial escapes
        try eval(init, in, defs, vars).map { init0 =>
          eval(src, in, defs, vars).foldLeft(init0) { (acc, v) =>
            eval(update, acc, defs, vars + (name -> v)).lastOption
              .getOrElse(NullNode.getInstance)
          }
        } catch { case b: BreakEx => b.outputs = Vector.empty; throw b }
      case Pipe(stages) => evalPipe(stages, Seq(in), defs, vars)
      case Comma(items) =>
        val out = Vector.newBuilder[JsonNode]
        try { items.foreach(i => out ++= eval(i, in, defs, vars)); out.result() }
        catch {
          case b: BreakEx =>
            b.outputs = out.result() ++ b.outputs; throw b
        }
      case ObjCons(fields) =>
        try fields.foldLeft(Seq(Js.obj())) { case (objs, (ke, e)) =>
          for {
            o <- objs
            k <- eval(ke, in, defs, vars)
            v <- eval(e, in, defs, vars)
          } yield {
            // jq: a computed key must evaluate to a string — silently
            // coercing an object/array with asText() yields ""
            if (!k.isTextual) throw new IllegalArgumentException(
              s"Object keys must be strings, not ${k.getNodeType.toString.toLowerCase}")
            val c = o.deepCopy[ObjectNode]()
            c.set[JsonNode](k.asText(), v)
            c
          }
        } catch { case b: BreakEx => b.outputs = Vector.empty; throw b }
      case ArrCons(items) =>
        // a break aborts the whole collection: outputs accumulated INSIDE
        // the unfinished array must not leak to the enclosing label
        val a = Js.arr()
        try {
          items.foreach(e => eval(e, in, defs, vars).foreach(a.add))
          Seq(a)
        } catch { case b: BreakEx => b.outputs = Vector.empty; throw b }
      case Del(target) =>
        Seq(delPaths(in, concretePaths(target, in, defs, vars)))
      case AssignOp(op, lhs, rhs) =>
        val paths = concretePaths(lhs, in, defs, vars)
        op match {
          case "|=" => // update: f sees the old value at each path
            Seq(paths.foldLeft(in) { (acc, p) =>
              val old = getPath(acc, p)
              eval(rhs, old, defs, vars).headOption match {
                case Some(v) => setPath(acc, p, v)
                case None    => delPaths(acc, Seq(p)) // empty update deletes
              }
            })
          case "=" => // plain: rhs evaluated against the ORIGINAL input,
            // one output per rhs output
            eval(rhs, in, defs, vars).map(v =>
              paths.foldLeft(in)((acc, p) => setPath(acc, p, v)))
          case _ => // op= : lhs |= . OP v, v against the original input
            val op0 = op.dropRight(1) // "+=" -> "+", "//=" -> "//"
            eval(rhs, in, defs, vars).map(v =>
              paths.foldLeft(in) { (acc, p) =>
                val old = getPath(acc, p)
                val nv =
                  if (op0 == "//") (if (truthyJq(old)) old else v)
                  else binop(op0, old, v)
                setPath(acc, p, nv)
              })
        }
      case Call(ns, name, args) =>
        val key = ns.map(n => s"$n::$name").getOrElse(name)
        defs.get(key) match {
          case Some(FnDef(params, body)) =>
            // jq parameters are filters; bind each arg as a zero-arg def
            val bound = defs ++ params.zip(args.map(FnDef(Nil, _)))
            eval(body, in, bound, vars)
          case None => builtinFn(key, args, in, defs, vars)
        }
      case IfElse(cond, thn, els) =>
        eval(cond, in, defs, vars).flatMap { c =>
          // JQ truthiness: false and null are falsy, everything else truthy
          if (c.isNull || (c.isBoolean && !c.asBoolean()))
            eval(els, in, defs, vars)
          else eval(thn, in, defs, vars)
        }
      case BinOp("//", l, r) =>
        val lv = eval(l, in, defs, vars).filter(truthyJq)
        if (lv.nonEmpty) lv else eval(r, in, defs, vars)
      case BinOp("and", l, r) =>
        eval(l, in, defs, vars).flatMap(a =>
          if (!truthyJq(a)) Seq(BooleanNode.FALSE)
          else eval(r, in, defs, vars)
            .map(b => BooleanNode.valueOf(truthyJq(b))))
      case BinOp("or", l, r) =>
        eval(l, in, defs, vars).flatMap(a =>
          if (truthyJq(a)) Seq(BooleanNode.TRUE)
          else eval(r, in, defs, vars)
            .map(b => BooleanNode.valueOf(truthyJq(b))))
      case BinOp(op, l, r) =>
        // jq iterates the RIGHT operand in the outer loop:
        // (1,2)+(10,20) yields 11,12,21,22 (not 11,21,12,22)
        val lv = eval(l, in, defs, vars)
        for {
          b <- eval(r, in, defs, vars)
          a <- lv
        } yield binop(op, a, b)
      case StrInterp(parts) =>
        parts.foldLeft(Seq("")) { (acc, part) =>
          part match {
            case Left(text) => acc.map(_ + text)
            case Right(e) =>
              for {
                prefix <- acc
                v <- eval(e, in, defs, vars)
              } yield prefix +
                (if (v.isTextual) v.asText() else Js.render(v))
          }
        }.map(TextNode.valueOf)
    }

  private def truthyJq(c: JsonNode): Boolean =
    !(c.isNull || (c.isBoolean && !c.asBoolean()))

  // -- paths ----------------------------------------------------------------
  // A concrete path is a list of object keys (Left) / array indexes (Right).

  private type PathElem = Either[String, Int]

  /** The concrete paths a path expression designates in `in` — the
    * machinery behind `del`, assignments, `paths` and `path(f)`.
    */
  private def concretePaths(ast: Ast, in: JsonNode, defs: Map[String, FnDef],
      vars: Map[String, JsonNode]): Seq[List[PathElem]] = ast match {
    case Identity => Seq(Nil)
    case Path(steps) =>
      def expand(node: JsonNode, rest: List[Step],
          acc: List[PathElem]): Seq[List[PathElem]] = rest match {
        case Nil => Seq(acc.reverse)
        case Field(f) :: more =>
          val next = if (node == null || node.isNull) NullNode.getInstance
            else Option(node.get(f)).getOrElse(NullNode.getInstance)
          expand(next, more, Left(f) :: acc)
        case Index(i) :: more =>
          val at = if (i < 0 && node != null) node.size() + i else i
          val next = if (node == null || node.isNull) NullNode.getInstance
            else Option(node.get(at)).getOrElse(NullNode.getInstance)
          expand(next, more, Right(at) :: acc)
        case IterateStep :: more =>
          if (node == null || node.isNull) Seq.empty
          else if (node.isArray)
            (0 until node.size()).flatMap(i =>
              expand(node.get(i), more, Right(i) :: acc))
          else if (node.isObject)
            Js.fields(node).flatMap { case (k, v) =>
              expand(v, more, Left(k) :: acc)
            }
          else Seq.empty
        case Slice(_, _) :: _ =>
          throw new IllegalArgumentException("slice is not assignable here")
      }
      expand(in, steps, Nil)
    case Comma(items) => items.flatMap(concretePaths(_, in, defs, vars))
    case Pipe(stages) => // `.a | .b` as a path: chase each prefix path
      stages.foldLeft(Seq(List.empty[PathElem])) { (prefixes, s) =>
        prefixes.flatMap(p =>
          concretePaths(s, getPath(in, p), defs, vars).map(p ++ _))
      }
    case Call(None, name, Nil) if defs.contains(name) =>
      concretePaths(defs(name).body, in, defs, vars)
    case other =>
      throw new IllegalArgumentException(
        s"not a path expression: $other")
  }

  private def getPath(n: JsonNode, path: Seq[PathElem]): JsonNode =
    path.foldLeft(n) { (cur, p) =>
      if (cur == null || cur.isNull) NullNode.getInstance
      else p match {
        case Left(f)  => Option(cur.get(f)).getOrElse(NullNode.getInstance)
        case Right(i) => Option(cur.get(i)).getOrElse(NullNode.getInstance)
      }
    }

  /** Functional set: copies along the path, creating containers for
    * missing/null intermediates (object for a key, array for an index —
    * jq setpath semantics, arrays padded with null).
    */
  private def setPath(n: JsonNode, path: Seq[PathElem],
      v: JsonNode): JsonNode = path.toList match {
    case Nil => v
    case Left(f) :: rest =>
      val o: ObjectNode =
        if (n != null && n.isObject) n.deepCopy[ObjectNode]() else Js.obj()
      val child = Option(o.get(f)).getOrElse(NullNode.getInstance)
      o.set[JsonNode](f, setPath(child, rest, v))
      o
    case Right(i) :: rest =>
      val a: ArrayNode =
        if (n != null && n.isArray) n.deepCopy[ArrayNode]() else Js.arr()
      val at = if (i < 0) a.size() + i else i
      require(at >= 0, s"out of range index $i")
      while (a.size() <= at) a.add(NullNode.getInstance)
      a.set(at, setPath(a.get(at), rest, v))
      a
  }

  /** Delete several concrete paths (longest/greatest-index first, so
    * earlier deletions don't shift later ones — jq delpaths order).
    */
  private def delPaths(n: JsonNode, paths: Seq[Seq[PathElem]]): JsonNode = {
    def del(node: JsonNode, path: List[PathElem]): JsonNode = path match {
      case Nil => NullNode.getInstance
      case Left(f) :: Nil =>
        node match {
          case o: ObjectNode =>
            val c = o.deepCopy[ObjectNode](); c.remove(f); c
          case other => other
        }
      case Right(i) :: Nil =>
        node match {
          case a: ArrayNode if i >= 0 && i < a.size() =>
            val c = a.deepCopy[ArrayNode](); c.remove(i); c
          case other => other
        }
      case head :: rest =>
        val (key, child) = head match {
          case Left(f)  => (head, Option(node.get(f)).orNull)
          case Right(i) => (head, Option(node.get(i)).orNull)
        }
        if (child == null) node
        else setPath(node, Seq(key), del(child, rest))
    }
    // total order (deepest first, then rightmost-first element-wise; a
    // mixed key/index position ranks indexes before keys) — a partial
    // comparator here trips TimSort's contract check on 32+ paths
    def elemCmp(x: PathElem, y: PathElem): Int = (x, y) match {
      case (Right(a), Right(b)) => b.compareTo(a)
      case (Left(a), Left(b))   => b.compareTo(a)
      case (Right(_), Left(_))  => -1
      case (Left(_), Right(_))  => 1
    }
    val ordered = paths.sorted(new Ordering[Seq[PathElem]] {
      def compare(a: Seq[PathElem], b: Seq[PathElem]): Int = {
        val c = b.length.compareTo(a.length)
        if (c != 0) c
        else a.iterator.zip(b.iterator).map((elemCmp _).tupled)
          .find(_ != 0).getOrElse(0)
      }
    })
    ordered.foldLeft(n)((acc, p) => del(acc, p.toList))
  }

  /** jq's cross-type total order:
    * null < false < true < numbers < strings < arrays < objects.
    */
  private[jq] def cmpJq(a: JsonNode, b: JsonNode): Int = {
    def rank(n: JsonNode): Int =
      if (n == null || n.isNull) 0
      else if (n.isBoolean) { if (n.asBoolean()) 2 else 1 }
      else if (n.isNumber) 3
      else if (n.isTextual) 4
      else if (n.isArray) 5
      else 6
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) ra - rb
    else ra match {
      case 0 | 1 | 2 => 0
      case 3 => java.lang.Double.compare(a.asDouble(), b.asDouble())
      case 4 => a.asText().compareTo(b.asText())
      case 5 =>
        val (ea, eb) = (Js.elems(a), Js.elems(b))
        ea.zip(eb).iterator.map { case (x, y) => cmpJq(x, y) }
          .find(_ != 0).getOrElse(ea.size - eb.size)
      case _ =>
        val (fa, fb) = (Js.fields(a).sortBy(_._1), Js.fields(b).sortBy(_._1))
        val keyCmp = fa.map(_._1).zip(fb.map(_._1)).iterator
          .map { case (x, y) => x.compareTo(y) }.find(_ != 0)
          .getOrElse(fa.size - fb.size)
        if (keyCmp != 0) keyCmp
        else fa.zip(fb).iterator.map { case ((_, x), (_, y)) => cmpJq(x, y) }
          .find(_ != 0).getOrElse(0)
    }
  }

  private def pathToArray(p: Seq[PathElem]): ArrayNode = {
    val a = Js.arr()
    p.foreach {
      case Left(f)  => a.add(f)
      case Right(i) => a.add(i)
    }
    a
  }

  private def arrayToPath(n: JsonNode): List[PathElem] =
    Js.elems(n).map(e =>
      if (e.isNumber) Right(e.asInt()) else Left(e.asText())).toList

  /** The jq builtins the subset supports. `map`/`select`/`empty` are
    * stream operations — trivial on the stream evaluator.
    */
  private def builtinFn(name: String, args: List[Ast], in: JsonNode,
      defs: Map[String, FnDef],
      vars: Map[String, JsonNode]): Seq[JsonNode] = name match {
    case "empty" => Seq.empty
    case "not"   => Seq(BooleanNode.valueOf(!truthyJq(in)))
    // this embedding feeds each invocation exactly ONE input, so the
    // additional-inputs stream is always exhausted (jq semantics when
    // stdin is drained): `input` errors, `inputs` is empty
    case "input" =>
      throw new IllegalArgumentException("No more inputs")
    case "inputs" => Seq.empty
    case "env"    => Seq(envNode)
    // halt: stop the whole program, keeping outputs already emitted
    // (the in-engine analog of jq's exit-0; there is no process to kill)
    case "halt" => throw new BreakEx(HaltLabel, Vector.empty)
    case "halt_error" =>
      throw new IllegalArgumentException(
        if (in != null && in.isTextual) in.asText() else Js.render(in))
    case "length" =>
      Seq(LongNode.valueOf(
        if (in == null || in.isNull) 0L
        else if (in.isTextual) in.asText().length.toLong
        else if (in.isArray || in.isObject) in.size().toLong
        else if (in.isNumber) math.abs(in.asDouble()).toLong
        else 0L))
    case "keys" =>
      val a = Js.arr()
      Js.fields(in).map(_._1).sorted.foreach(a.add)
      Seq(a)
    case "values" => // jq: select(. != null)
      if (in != null && !in.isNull) Seq(in) else Seq.empty
    case "keys_unsorted" =>
      val a = Js.arr()
      Js.fields(in).map(_._1).foreach(a.add)
      Seq(a)
    case "objects"   => if (in.isObject) Seq(in) else Seq.empty
    case "arrays"    => if (in.isArray) Seq(in) else Seq.empty
    case "booleans"  => if (in.isBoolean) Seq(in) else Seq.empty
    case "numbers"   => if (in.isNumber) Seq(in) else Seq.empty
    case "strings"   => if (in.isTextual) Seq(in) else Seq.empty
    case "nulls"     => if (in == null || in.isNull) Seq(in) else Seq.empty
    case "iterables" => if (in.isArray || in.isObject) Seq(in) else Seq.empty
    case "scalars"   => if (!in.isArray && !in.isObject) Seq(in) else Seq.empty
    case "has" =>
      eval(args.head, in, defs, vars).map {
        case k if k.isTextual => BooleanNode.valueOf(in.has(k.asText()))
        case k if k.isNumber  => BooleanNode.valueOf(in.has(k.asInt()))
        case _                => BooleanNode.FALSE
      }
    case "map" => // map(f) == [.[] | f]
      val a = Js.arr()
      step(in, IterateStep).flatMap(eval(args.head, _, defs, vars))
        .foreach(a.add)
      Seq(a)
    case "select" => // keep the input when f is truthy, else emit nothing
      eval(args.head, in, defs, vars).flatMap(c =>
        if (truthyJq(c)) Seq(in) else Seq.empty)
    case "add" =>
      Seq(step(in, IterateStep)
        .reduceOption((a, b) => binop("+", a, b))
        .getOrElse(NullNode.getInstance))
    case "first" =>
      if (args.isEmpty) Seq(step(in, IterateStep).headOption
        .getOrElse(NullNode.getInstance))
      else eval(args.head, in, defs, vars).take(1)
    case "last" =>
      if (args.isEmpty)
        Seq(step(in, IterateStep).lastOption.getOrElse(NullNode.getInstance))
      else Seq(eval(args.head, in, defs, vars).lastOption
        .getOrElse(NullNode.getInstance))
    case "nth" =>
      eval(args.head, in, defs, vars).flatMap { n =>
        if (args.size == 1)
          Seq(step(in, IterateStep).lift(n.asInt())
            .getOrElse(NullNode.getInstance))
        else eval(args(1), in, defs, vars).slice(n.asInt(), n.asInt() + 1)
      }
    case "limit" =>
      eval(args.head, in, defs, vars).flatMap(n =>
        eval(args(1), in, defs, vars).take(n.asInt()))
    case "until" => // until(cond; update): loop . until cond holds
      var cur = in
      var guard = 0
      while (!eval(args.head, cur, defs, vars).headOption.exists(truthyJq)) {
        cur = eval(args(1), cur, defs, vars).headOption
          .getOrElse(NullNode.getInstance)
        guard += 1
        require(guard < 1000000, "until(cond; update) did not converge")
      }
      Seq(cur)
    case "while" => // while(cond; update): emit . while cond holds
      val out = mutable.ListBuffer[JsonNode]()
      var cur = in
      var guard = 0
      while (eval(args.head, cur, defs, vars).headOption.exists(truthyJq)) {
        out += cur
        cur = eval(args(1), cur, defs, vars).headOption
          .getOrElse(NullNode.getInstance)
        guard += 1
        require(guard < 1000000, "while(cond; update) did not converge")
      }
      out.toList
    case "recurse" => // `..` / recurse(f): . plus descendants, depth-first
      if (args.isEmpty) {
        def descend(n: JsonNode): Seq[JsonNode] =
          n +: (if (n.isArray || n.isObject)
            step(n, IterateStep).flatMap(descend)
          else Seq.empty)
        descend(in)
      } else { // iterative pre-order walk: jq `def r: ., (f | r); r`
        val out = mutable.ListBuffer[JsonNode]()
        val stack = mutable.Stack[JsonNode](in)
        while (stack.nonEmpty) {
          val n = stack.pop()
          out += n
          require(out.size < 1000000, "recurse(f) did not converge")
          val children =
            try eval(args.head, n, defs, vars)
            catch { case _: Exception => Seq.empty }
          children.reverseIterator.foreach(stack.push)
        }
        out.toList
      }
    case "range" =>
      if (args.size >= 3)
        (for {
          from <- eval(args.head, in, defs, vars)
          upto <- eval(args(1), in, defs, vars)
          by <- eval(args(2), in, defs, vars)
        } yield {
          val (f, u, b) = (from.asDouble(), upto.asDouble(), by.asDouble())
          val out = mutable.ListBuffer[JsonNode]()
          var x = f
          while (if (b > 0) x < u else b < 0 && x > u) {
            out += (if (x == x.toLong) LongNode.valueOf(x.toLong)
              else DoubleNode.valueOf(x))
            x += b
          }
          out.toList
        }).flatten
      else if (args.size == 2)
        (for {
          from <- eval(args.head, in, defs, vars)
          upto <- eval(args(1), in, defs, vars)
        } yield (from.asLong() until upto.asLong()).map(LongNode.valueOf))
          .flatten
      else
        eval(args.head, in, defs, vars).flatMap(n =>
          (0L until n.asLong()).map(LongNode.valueOf))
    case "tostring" =>
      Seq(TextNode.valueOf(
        if (in.isTextual) in.asText() else Js.render(in)))
    case "tonumber" =>
      Seq(
        if (in.isNumber) in
        else DoubleNode.valueOf(in.asText().toDouble))
    case "floor" => Seq(LongNode.valueOf(math.floor(in.asDouble()).toLong))
    case "type" =>
      Seq(TextNode.valueOf(
        if (in == null || in.isNull) "null"
        else if (in.isBoolean) "boolean"
        else if (in.isNumber) "number"
        else if (in.isTextual) "string"
        else if (in.isArray) "array"
        else "object"))
    case "test" =>
      val (re, _) = regexArgs(args, in, defs, vars)
      Seq(BooleanNode.valueOf(re.matcher(in.asText()).find()))
    case "capture" => // named groups -> object; honors flags (i, g, ...);
      // jq: no match -> EMPTY stream, not an empty object
      val (p, flags) = regexArgs(args, in, defs, vars)
      val names = groupNames(p.pattern()).flatten
      val m = p.matcher(in.asText())
      val out = mutable.ListBuffer[JsonNode]()
      while (m.find() && (out.isEmpty || flags.contains('g'))) {
        val o = Js.obj()
        names.foreach(n => Option(m.group(n)).foreach(v => o.put(n, v)))
        out += o
      }
      out.toList
    case "sub" | "gsub" =>
      // jq: the replacement is a FILTER evaluated with the named-capture
      // object as its input — `gsub("(?<x>\\d)"; "<\(.x)>")` works
      val (re, flags) = regexArgs(
        args.head :: (if (args.size > 2) List(args(2)) else Nil),
        in, defs, vars)
      val global = name == "gsub" || flags.contains('g')
      val names = groupNames(re.pattern()).flatten
      val m = re.matcher(in.asText())
      val sb = new java.lang.StringBuffer
      var continue = true
      while (continue && m.find()) {
        val caps = Js.obj()
        names.foreach(n =>
          Option(m.group(n)).foreach(v => caps.put(n, v)))
        val repl = eval(args(1), caps, defs, vars).headOption
          .map(r => if (r.isTextual) r.asText() else Js.render(r))
          .getOrElse("")
        m.appendReplacement(sb,
          java.util.regex.Matcher.quoteReplacement(repl))
        continue = global
      }
      m.appendTail(sb)
      Seq(TextNode.valueOf(sb.toString))
    case "split" =>
      if (args.size > 1) { // split(re; flags): regex split
        val (re, _) = regexArgs(args, in, defs, vars)
        Seq(Js.mkArr(re.split(in.asText(), -1).toSeq.map(TextNode.valueOf)))
      } else
        eval(args.head, in, defs, vars).map { sep =>
          val a = Js.arr()
          in.asText().split(java.util.regex.Pattern.quote(sep.asText()), -1)
            .foreach(a.add)
          a: JsonNode
        }
    case "join" =>
      eval(args.head, in, defs, vars).map(sep =>
        TextNode.valueOf(step(in, IterateStep)
          .map(e => if (e.isTextual) e.asText() else Js.render(e))
          .mkString(sep.asText())))
    case "startswith" =>
      eval(args.head, in, defs, vars).map(p =>
        BooleanNode.valueOf(in.asText().startsWith(p.asText())))
    case "endswith" =>
      eval(args.head, in, defs, vars).map(p =>
        BooleanNode.valueOf(in.asText().endsWith(p.asText())))
    case "ltrimstr" =>
      eval(args.head, in, defs, vars).map(p =>
        TextNode.valueOf(in.asText().stripPrefix(p.asText())))
    case "rtrimstr" =>
      eval(args.head, in, defs, vars).map(p =>
        TextNode.valueOf(in.asText().stripSuffix(p.asText())))
    case "ascii_downcase" => Seq(TextNode.valueOf(in.asText().toLowerCase))
    case "ascii_upcase"   => Seq(TextNode.valueOf(in.asText().toUpperCase))
    case "trim"  => Seq(TextNode.valueOf(in.asText().trim))
    case "ltrim" => Seq(TextNode.valueOf(
      in.asText().dropWhile(_.isWhitespace)))
    case "rtrim" => Seq(TextNode.valueOf(
      in.asText().reverse.dropWhile(_.isWhitespace).reverse))
    case "utf8bytelength" =>
      Seq(LongNode.valueOf(
        in.asText().getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .length.toLong))

    // -- sorting and grouping (jq cross-type total order) --
    case "sort" =>
      Seq(Js.mkArr(Js.elems(in).sortWith(cmpJq(_, _) < 0)))
    case "sort_by" => // key = the COLLECTED outputs of f, compared as array
      Seq(Js.mkArr(Js.elems(in)
        .map(e => (Js.mkArr(eval(args.head, e, defs, vars)), e))
        .sortWith((a, b) => cmpJq(a._1, b._1) < 0).map(_._2)))
    case "group_by" =>
      val keyed = Js.elems(in)
        .map(e => (Js.mkArr(eval(args.head, e, defs, vars)), e))
        .sortWith((a, b) => cmpJq(a._1, b._1) < 0)
      val groups = mutable.ListBuffer[JsonNode]()
      var cur = mutable.ListBuffer[JsonNode]()
      var curKey: JsonNode = null
      keyed.foreach { case (k, e) =>
        if (curKey != null && cmpJq(curKey, k) != 0) {
          groups += Js.mkArr(cur.toList); cur = mutable.ListBuffer()
        }
        curKey = k; cur += e
      }
      if (cur.nonEmpty) groups += Js.mkArr(cur.toList)
      Seq(Js.mkArr(groups.toList))
    case "unique" =>
      val sorted = Js.elems(in).sortWith(cmpJq(_, _) < 0)
      Seq(Js.mkArr(sorted.foldLeft(List.empty[JsonNode])((acc, e) =>
        if (acc.nonEmpty && cmpJq(acc.head, e) == 0) acc else e :: acc)
        .reverse))
    case "unique_by" =>
      val keyed = Js.elems(in)
        .map(e => (Js.mkArr(eval(args.head, e, defs, vars)), e))
        .sortWith((a, b) => cmpJq(a._1, b._1) < 0)
      Seq(Js.mkArr(keyed.foldLeft(List.empty[(JsonNode, JsonNode)])(
        (acc, e) =>
          if (acc.nonEmpty && cmpJq(acc.head._1, e._1) == 0) acc
          else e :: acc).reverse.map(_._2)))
    case "reverse" =>
      if (in.isTextual) Seq(TextNode.valueOf(in.asText().reverse))
      else Seq(Js.mkArr(Js.elems(in).reverse))
    case "min" =>
      Seq(Js.elems(in).reduceOption((a, b) => if (cmpJq(b, a) < 0) b else a)
        .getOrElse(NullNode.getInstance))
    case "max" =>
      Seq(Js.elems(in).reduceOption((a, b) => if (cmpJq(b, a) >= 0) b else a)
        .getOrElse(NullNode.getInstance))
    case "min_by" | "max_by" =>
      val keyed = Js.elems(in)
        .map(e => (Js.mkArr(eval(args.head, e, defs, vars)), e))
      Seq(
        (if (name == "min_by")
          keyed.reduceOption((a, b) => if (cmpJq(b._1, a._1) < 0) b else a)
        else
          keyed.reduceOption((a, b) => if (cmpJq(b._1, a._1) >= 0) b else a))
          .map(_._2).getOrElse(NullNode.getInstance))

    // -- entries --
    case "to_entries" =>
      Seq(Js.mkArr(Js.fields(in).map { case (k, v) =>
        val o = Js.obj(); o.put("key", k); o.set[JsonNode]("value", v); o
      }))
    case "from_entries" =>
      val o = Js.obj()
      Js.elems(in).foreach { e =>
        val k = List("key", "k", "name", "Name", "K", "Key")
          .flatMap(f => Option(e.get(f))).headOption
          .getOrElse(NullNode.getInstance)
        val v = List("value", "v", "Value", "V")
          .flatMap(f => Option(e.get(f))).headOption
          .getOrElse(NullNode.getInstance)
        o.set[JsonNode](
          if (k.isTextual) k.asText() else Js.render(k), v)
      }
      Seq(o)
    case "with_entries" => // to_entries | map(f) | from_entries
      builtinFn("to_entries", Nil, in, defs, vars)
        .flatMap(es => builtinFn("map", args, es, defs, vars))
        .flatMap(es => builtinFn("from_entries", Nil, es, defs, vars))
    case "map_values" => // .[] |= f (first output; empty drops the entry)
      if (in.isObject) {
        val o = Js.obj()
        Js.fields(in).foreach { case (k, v) =>
          eval(args.head, v, defs, vars).headOption
            .foreach(o.set[JsonNode](k, _))
        }
        Seq(o)
      } else
        Seq(Js.mkArr(Js.elems(in).flatMap(e =>
          eval(args.head, e, defs, vars).headOption)))

    // -- predicates --
    case "any" | "all" =>
      val stream: Seq[JsonNode] =
        if (args.isEmpty) step(in, IterateStep)
        else if (args.size == 1)
          step(in, IterateStep).flatMap(eval(args.head, _, defs, vars))
        else eval(args.head, in, defs, vars)
          .flatMap(v => eval(args(1), v, defs, vars))
      Seq(BooleanNode.valueOf(
        if (name == "any") stream.exists(truthyJq)
        else stream.forall(truthyJq)))
    case "contains" =>
      eval(args.head, in, defs, vars)
        .map(b => BooleanNode.valueOf(containsJq(in, b)))
    case "inside" =>
      eval(args.head, in, defs, vars)
        .map(b => BooleanNode.valueOf(containsJq(b, in)))
    case "in" =>
      eval(args.head, in, defs, vars).map {
        case o if o.isObject => BooleanNode.valueOf(o.has(in.asText()))
        case a if a.isArray =>
          BooleanNode.valueOf(in.asInt() >= 0 && in.asInt() < a.size())
        case _ => BooleanNode.FALSE
      }
    case "isnan"      => Seq(BooleanNode.valueOf(
      in.isNumber && in.asDouble().isNaN))
    case "isinfinite" => Seq(BooleanNode.valueOf(
      in.isNumber && in.asDouble().isInfinite))
    case "infinite"   => Seq(DoubleNode.valueOf(Double.PositiveInfinity))
    case "nan"        => Seq(DoubleNode.valueOf(Double.NaN))

    // -- arrays --
    case "flatten" =>
      val depth =
        if (args.isEmpty) Int.MaxValue
        else eval(args.head, in, defs, vars).head.asInt()
      def flat(n: JsonNode, d: Int): Seq[JsonNode] =
        Js.elems(n).flatMap(e =>
          if (e.isArray && d > 0) flat(e, d - 1) else Seq(e))
      Seq(Js.mkArr(flat(in, depth)))
    case "transpose" =>
      val rows = Js.elems(in)
      val width = rows.map(_.size()).maxOption.getOrElse(0)
      Seq(Js.mkArr((0 until width).map(i =>
        Js.mkArr(rows.map(r =>
          Option[JsonNode](r.get(i)).getOrElse(NullNode.getInstance))))))
    case "index" | "rindex" | "indices" =>
      eval(args.head, in, defs, vars).map { needle =>
        val hits: Seq[Int] =
          if (in.isTextual) {
            val (s, sub) = (in.asText(), needle.asText())
            if (sub.isEmpty) Seq.empty
            else Iterator.iterate(s.indexOf(sub))(i =>
              s.indexOf(sub, i + 1)).takeWhile(_ >= 0).toSeq
          } else {
            val elems = Js.elems(in)
            val sub = if (needle.isArray) Js.elems(needle) else Seq(needle)
            if (sub.isEmpty) Seq.empty
            else elems.indices.filter(i =>
              i + sub.size <= elems.size &&
                sub.indices.forall(j => cmpJq(elems(i + j), sub(j)) == 0))
          }
        name match {
          case "index" => hits.headOption.map(i => LongNode.valueOf(i.toLong))
            .getOrElse(NullNode.getInstance)
          case "rindex" => hits.lastOption.map(i => LongNode.valueOf(i.toLong))
            .getOrElse(NullNode.getInstance)
          case _ => Js.mkArr(hits.map(i => LongNode.valueOf(i.toLong)))
        }
      }

    // -- paths --
    case "paths" =>
      val all = allPaths(in, Vector.empty)
      val filtered =
        if (args.isEmpty) all
        else all.filter { case (_, v) =>
          eval(args.head, v, defs, vars).headOption.exists(truthyJq)
        }
      filtered.map { case (p, _) => pathToArray(p) }
    case "leaf_paths" =>
      allPaths(in, Vector.empty)
        .filter { case (_, v) => !v.isArray && !v.isObject }
        .map { case (p, _) => pathToArray(p) }
    case "path" =>
      concretePaths(args.head, in, defs, vars).map(pathToArray)
    case "getpath" =>
      eval(args.head, in, defs, vars)
        .map(p => getPath(in, arrayToPath(p)))
    case "setpath" =>
      for {
        p <- eval(args.head, in, defs, vars)
        v <- eval(args(1), in, defs, vars)
      } yield setPath(in, arrayToPath(p), v)
    case "delpaths" =>
      eval(args.head, in, defs, vars).map(ps =>
        delPaths(in, Js.elems(ps).map(arrayToPath)))

    // tostream: [path, leaf] per scalar/empty container, then a
    // 1-element [path-of-last-child] closing event per nonempty
    // container (jq manual's streamed form)
    case "tostream" =>
      def key(k: Either[String, Int]): JsonNode = k match {
        case Left(f)  => TextNode.valueOf(f)
        case Right(i) => LongNode.valueOf(i.toLong)
      }
      def stream(n: JsonNode, path: Vector[JsonNode]): Seq[JsonNode] = {
        def ev(items: JsonNode*): JsonNode = {
          val a = Js.arr(); items.foreach(a.add); a
        }
        def pv(p: Vector[JsonNode]): JsonNode = {
          val a = Js.arr(); p.foreach(a.add); a
        }
        val children: Seq[(JsonNode, JsonNode)] =
          if (n.isObject) Js.fields(n).map { case (k, v) =>
            (key(Left(k)), v) }
          else if (n.isArray) Js.elems(n).zipWithIndex.map { case (v, i) =>
            (key(Right(i)), v) }
          else Seq.empty
        if (!n.isContainerNode || children.isEmpty) Seq(ev(pv(path), n))
        else children.flatMap { case (k, v) => stream(v, path :+ k) } :+
          ev(pv(path :+ children.last._1))
      }
      stream(in, Vector.empty)
    // fromstream(f): reassemble f's event stream; a top-level closing
    // event (|path| ≤ 1) or a [[], v] scalar pair emits one value
    case "fromstream" =>
      val out = Vector.newBuilder[JsonNode]
      var acc: JsonNode = null
      eval(args.head, in, defs, vars).foreach { e =>
        require(e.isArray && e.size() >= 1 && e.get(0).isArray,
          s"fromstream: not a stream event: ${Js.render(e)}")
        val p = arrayToPath(e.get(0))
        if (e.size() >= 2) {
          if (p.isEmpty) out += e.get(1)
          else acc = setPath(acc, p, e.get(1))
        } else if (p.length <= 1 && acc != null) {
          out += acc; acc = null
        }
      }
      out.result()

    // -- json / string conversion --
    case "tojson" => Seq(TextNode.valueOf(Js.render(in)))
    case "fromjson" => Seq(Js.parse(in.asText()))
    case "explode" =>
      Seq(Js.mkArr(in.asText().codePoints().toArray.toSeq
        .map(c => LongNode.valueOf(c.toLong))))
    case "implode" =>
      val sb = new java.lang.StringBuilder
      Js.elems(in).foreach(c => sb.appendCodePoint(c.asInt()))
      Seq(TextNode.valueOf(sb.toString))
    case "@text" => builtinFn("tostring", Nil, in, defs, vars)
    case "@json" => Seq(TextNode.valueOf(Js.render(in)))
    case "@base64" =>
      Seq(TextNode.valueOf(java.util.Base64.getEncoder.encodeToString(
        (if (in.isTextual) in.asText() else Js.render(in))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    case "@base64d" =>
      Seq(TextNode.valueOf(new String(
        java.util.Base64.getDecoder.decode(in.asText()),
        java.nio.charset.StandardCharsets.UTF_8)))
    case "@uri" =>
      val s = if (in.isTextual) in.asText() else Js.render(in)
      val sb = new StringBuilder
      // by CODE POINT (surrogate pairs encode as one UTF-8 sequence);
      // only ASCII unreserved chars pass through
      s.codePoints().forEach { cp =>
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= '0' && cp <= '9') || "-_.~".indexOf(cp) >= 0)
          sb.append(cp.toChar)
        else
          new String(Character.toChars(cp))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
      }
      Seq(TextNode.valueOf(sb.toString))
    case "@csv" | "@tsv" =>
      Seq(TextNode.valueOf(Js.elems(in).map { e =>
        if (name == "@csv") {
          if (e.isTextual) "\"" + e.asText().replace("\"", "\"\"") + "\""
          else if (e.isNull) "" else Js.render(e)
        } else {
          val s = if (e.isTextual) e.asText()
            else if (e.isNull) "" else Js.render(e)
          s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
            .replace("\r", "\\r")
        }
      }.mkString(if (name == "@csv") "," else "\t")))
    case "@html" =>
      Seq(TextNode.valueOf(
        (if (in.isTextual) in.asText() else Js.render(in))
          .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
          .replace("'", "&#39;").replace("\"", "&quot;")))

    // -- math --
    case "ceil"  => Seq(LongNode.valueOf(math.ceil(in.asDouble()).toLong))
    case "round" => // C round: half away from zero
      val x = in.asDouble()
      Seq(LongNode.valueOf(
        if (x < 0) -math.round(-x) else math.round(x)))
    case "sqrt" => Seq(DoubleNode.valueOf(math.sqrt(in.asDouble())))
    case "pow" =>
      for {
        x <- eval(args.head, in, defs, vars)
        y <- eval(args(1), in, defs, vars)
      } yield DoubleNode.valueOf(math.pow(x.asDouble(), y.asDouble()))
    case "log"   => Seq(DoubleNode.valueOf(math.log(in.asDouble())))
    case "log2"  => Seq(DoubleNode.valueOf(
      math.log(in.asDouble()) / math.log(2)))
    case "log10" => Seq(DoubleNode.valueOf(math.log10(in.asDouble())))
    case "exp"   => Seq(DoubleNode.valueOf(math.exp(in.asDouble())))
    case "exp2"  => Seq(DoubleNode.valueOf(math.pow(2, in.asDouble())))
    case "exp10" => Seq(DoubleNode.valueOf(math.pow(10, in.asDouble())))
    case "fabs"  => Seq(DoubleNode.valueOf(math.abs(in.asDouble())))
    case "abs" =>
      Seq(if (in.isIntegralNumber) LongNode.valueOf(math.abs(in.asLong()))
      else DoubleNode.valueOf(math.abs(in.asDouble())))

    // -- dates --
    case "now" =>
      Seq(DoubleNode.valueOf(System.currentTimeMillis() / 1000.0))
    case "todate" | "todateiso8601" =>
      Seq(TextNode.valueOf(java.time.Instant
        .ofEpochSecond(in.asLong()).toString.replace(".000Z", "Z")))
    case "fromdate" | "fromdateiso8601" =>
      Seq(LongNode.valueOf(
        java.time.Instant.parse(in.asText()).getEpochSecond))

    // -- regex (beyond test/capture/sub/gsub) --
    case "match" =>
      val (re, flags) = regexArgs(args, in, defs, vars)
      val m = re.matcher(in.asText())
      val names = groupNames(re.pattern())
      val out = mutable.ListBuffer[JsonNode]()
      while (m.find() && (out.isEmpty || flags.contains('g'))) {
        val o = Js.obj()
        o.put("offset", m.start()); o.put("length", m.end() - m.start())
        o.put("string", m.group())
        val caps = Js.arr()
        (1 to m.groupCount()).foreach { g =>
          val c = Js.obj()
          c.put("offset", m.start(g))
          c.put("length",
            if (m.start(g) < 0) 0 else m.end(g) - m.start(g))
          c.set[JsonNode]("string",
            Option(m.group(g)).map(TextNode.valueOf)
              .getOrElse(NullNode.getInstance))
          c.set[JsonNode]("name",
            names.lift(g - 1).flatten.map(TextNode.valueOf)
              .getOrElse(NullNode.getInstance))
          caps.add(c)
        }
        o.set[JsonNode]("captures", caps)
        out += o
      }
      out.toList
    case "scan" =>
      val (re, _) = regexArgs(args, in, defs, vars)
      val m = re.matcher(in.asText())
      val out = mutable.ListBuffer[JsonNode]()
      while (m.find())
        out += (if (m.groupCount() == 0) TextNode.valueOf(m.group())
        else Js.mkArr((1 to m.groupCount()).map(g =>
          Option(m.group(g)).map(TextNode.valueOf(_): JsonNode)
            .getOrElse(NullNode.getInstance))))
      out.toList
    case "splits" =>
      val (re, _) = regexArgs(args, in, defs, vars)
      re.split(in.asText(), -1).toSeq.map(TextNode.valueOf)

    // -- structure walking --
    case "walk" => // bottom-up transform, first output of f per node
      def w(n: JsonNode): JsonNode = {
        val t: JsonNode =
          if (n.isArray) Js.mkArr(Js.elems(n).map(w))
          else if (n.isObject) {
            val o = Js.obj()
            Js.fields(n).foreach { case (k, v) => o.set[JsonNode](k, w(v)) }
            o
          } else n
        eval(args.head, t, defs, vars).headOption
          .getOrElse(NullNode.getInstance)
      }
      Seq(w(in))

    // -- diagnostics --
    case "error" =>
      val msg =
        if (args.isEmpty) in
        else eval(args.head, in, defs, vars).headOption
          .getOrElse(NullNode.getInstance)
      throw new IllegalArgumentException(
        if (msg.isTextual) msg.asText() else Js.render(msg))
    case "debug" =>
      System.err.println(s"""["DEBUG:",${Js.render(in)}]""")
      Seq(in)
    case "stderr" =>
      System.err.println(Js.render(in))
      Seq(in)

    case other =>
      throw new IllegalArgumentException(s"undefined filter $other")
  }

  /** Group names by CAPTURING-group index (1-based list position):
    * `(a)(?<x>b)` → List(None, Some("x")). Scans the pattern source —
    * Java's Matcher has no index→name API — skipping escapes, character
    * classes, non-capturing groups and lookarounds.
    */
  private[jq] def groupNames(re: String): List[Option[String]] = {
    val out = mutable.ListBuffer[Option[String]]()
    var i = 0
    var inClass = false
    while (i < re.length) {
      re(i) match {
        case '\\' => i += 1 // skip the escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass  => inClass = false
        case '(' if !inClass =>
          if (i + 1 < re.length && re(i + 1) == '?') {
            // (?<name>...) is a capturing named group; (?<= (?<! (?: (?=
            // (?! (?i) ... are not capturing
            if (i + 2 < re.length && re(i + 2) == '<' &&
              i + 3 < re.length && re(i + 3).isLetter) {
              val end = re.indexOf('>', i + 3)
              out += Some(re.substring(i + 3, end))
              i = end
            }
          } else out += None
        case _ =>
      }
      i += 1
    }
    out.toList
  }

  /** (pattern, flags) from regex builtin args: `f(re)` or `f(re; flags)`.
    * Flags: i (case-insensitive), x (comments), s (dotall), m (multiline),
    * g (global — interpreted by the caller).
    */
  private def regexArgs(args: List[Ast], in: JsonNode,
      defs: Map[String, FnDef],
      vars: Map[String, JsonNode]): (java.util.regex.Pattern, String) = {
    val re = eval(args.head, in, defs, vars).head.asText()
    val flags =
      if (args.size > 1) eval(args(1), in, defs, vars).head.asText() else ""
    var f = 0
    if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
    if (flags.contains('x')) f |= java.util.regex.Pattern.COMMENTS
    if (flags.contains('s')) f |= java.util.regex.Pattern.DOTALL
    if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
    (java.util.regex.Pattern.compile(re, f), flags)
  }

  /** Deep containment: objects need every key of `b` contained in `a`'s
    * value, arrays need every element of `b` contained in SOME element of
    * `a`, strings are substring, scalars are equality.
    */
  private def containsJq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isObject && b.isObject)
      Js.fields(b).forall { case (k, bv) =>
        Option(a.get(k)).exists(av => containsJq(av, bv))
      }
    else if (a.isArray && b.isArray)
      Js.elems(b).forall(bv => Js.elems(a).exists(av => containsJq(av, bv)))
    else if (a.isTextual && b.isTextual) a.asText().contains(b.asText())
    else cmpJq(a, b) == 0

  /** All non-root (path, value) pairs, depth-first, self before children. */
  private def allPaths(n: JsonNode,
      prefix: Vector[PathElem]): Seq[(Vector[PathElem], JsonNode)] =
    if (n.isArray)
      (0 until n.size()).flatMap { i =>
        val c = n.get(i)
        (prefix :+ (Right(i): PathElem), c) +:
          allPaths(c, prefix :+ (Right(i): PathElem))
      }
    else if (n.isObject)
      Js.fields(n).flatMap { case (k, v) =>
        (prefix :+ (Left(k): PathElem), v) +:
          allPaths(v, prefix :+ (Left(k): PathElem))
      }
    else Seq.empty

  /** JQ `+`: numbers add, strings concat, arrays concat, objects merge
    * (right wins), null is the identity.
    */
  private def binop(op: String, l: JsonNode, r: JsonNode): JsonNode =
    (op, l, r) match {
      // numeric nodes compare by value (IntNode(0) != LongNode(0) in
      // Jackson object equality)
      case ("==", a, b) if a.isNumber && b.isNumber =>
        BooleanNode.valueOf(a.asDouble() == b.asDouble())
      case ("!=", a, b) if a.isNumber && b.isNumber =>
        BooleanNode.valueOf(a.asDouble() != b.asDouble())
      case ("==", a, b) => BooleanNode.valueOf(a == b)
      case ("!=", a, b) => BooleanNode.valueOf(a != b)
      case ("<" | ">" | "<=" | ">=", a, b) =>
        val c =
          if (a.isNumber && b.isNumber)
            java.lang.Double.compare(a.asDouble(), b.asDouble())
          else a.asText().compareTo(b.asText())
        BooleanNode.valueOf(op match {
          case "<"  => c < 0
          case ">"  => c > 0
          case "<=" => c <= 0
          case ">=" => c >= 0
        })
      case ("+", a, b) if a.isNull => b
      case ("+", a, b) if b.isNull => a
      case ("+", a: ObjectNode, b: ObjectNode) =>
        val merged = a.deepCopy[ObjectNode]()
        Js.fields(b).foreach { case (k, v) => merged.set[JsonNode](k, v) }
        merged
      case ("+", a: ArrayNode, b: ArrayNode) =>
        val out = a.deepCopy[ArrayNode]()
        b.elements().forEachRemaining(e => out.add(e))
        out
      case ("+", a, b) if a.isTextual || b.isTextual =>
        TextNode.valueOf(a.asText() + b.asText())
      case (_, a, b) if a.isNumber && b.isNumber =>
        val exact = (a.isIntegralNumber && b.isIntegralNumber)
        op match {
          case "+" =>
            if (exact) LongNode.valueOf(a.asLong() + b.asLong())
            else DoubleNode.valueOf(a.asDouble() + b.asDouble())
          case "-" =>
            if (exact) LongNode.valueOf(a.asLong() - b.asLong())
            else DoubleNode.valueOf(a.asDouble() - b.asDouble())
          case "*" =>
            if (exact) LongNode.valueOf(a.asLong() * b.asLong())
            else DoubleNode.valueOf(a.asDouble() * b.asDouble())
          case "/" => DoubleNode.valueOf(a.asDouble() / b.asDouble())
          case "%" => // jq %: integer modulo (operands truncated)
            LongNode.valueOf(a.asLong() % b.asLong())
        }
      case ("*", a, b) if a.isTextual && b.isNumber => // string repeat
        if (b.asInt() <= 0) NullNode.getInstance
        else TextNode.valueOf(a.asText() * b.asInt())
      case ("/", a, b) if a.isTextual && b.isTextual => // jq: split
        val out = Js.arr()
        a.asText()
          .split(java.util.regex.Pattern.quote(b.asText()), -1)
          .foreach(out.add)
        out
      case ("-", a: ArrayNode, b: ArrayNode) => // array difference
        val keep = Js.elems(a).filterNot(x =>
          Js.elems(b).exists(y => cmpJq(x, y) == 0))
        val out = Js.arr(); keep.foreach(out.add); out
      case ("*", a: ObjectNode, b: ObjectNode) => // deep merge
        def deep(x: JsonNode, y: JsonNode): JsonNode =
          if (x.isObject && y.isObject) {
            val m = x.deepCopy[ObjectNode]()
            Js.fields(y).foreach { case (k, v) =>
              m.set[JsonNode](k,
                Option(x.get(k)).map(deep(_, v)).getOrElse(v))
            }
            m
          } else y
        deep(a, b)
      case _ =>
        throw new IllegalArgumentException(s"cannot apply $op to $l, $r")
    }

  // -- tokenizer ------------------------------------------------------------

  private final class Tokens(script: String) {
    private val (tokens: Vector[String], tokenLines: Vector[Int]) =
      tokenize(script)
    private var pos = 0
    private var marked = 0

    /** 1-based source line of the current token (for `$__loc__`). */
    def line: Int =
      if (pos < tokenLines.length) tokenLines(pos)
      else tokenLines.lastOption.getOrElse(1)

    def peek: String = if (pos < tokens.length) tokens(pos) else null
    def peekIs(s: String): Boolean = peek == s
    def peekIdent: Boolean =
      peek != null && (peek.head.isLetter || peek.head == '_') &&
        !Set("def", "import", "as", "del", "true", "false", "null",
          "if", "then", "else", "end", "elif", "reduce")(peek)
    def peekString: Boolean = peek != null && peek.head == '"'
    def next(): String = { val t = peek; pos += 1; t }
    def mark(): Unit = marked = pos
    def reset(): Unit = pos = marked
    def expect(s: String): Unit = {
      val t = next()
      require(t == s, s"expected '$s' but found '$t'")
    }
    def ident(): String = {
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

    private def tokenize(s: String): (Vector[String], Vector[Int]) = {
      val out = mutable.ArrayBuffer[String]()
      val lines = mutable.ArrayBuffer[Int]()
      var i = 0
      var line = 1
      def push(tok: String): Unit = { out += tok; lines += line }
      while (i < s.length) {
        val c = s(i)
        if (c.isWhitespace) { if (c == '\n') line += 1; i += 1 }
        else if (c == '#') { while (i < s.length && s(i) != '\n') i += 1 }
        else if (c == '"') {
          val (tok, after) = Tokens.stringToken(s, i)
          push(tok)
          line += s.substring(i, after).count(_ == '\n')
          i = after
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          push(s.substring(start, i))
        } else if (c.isDigit) {
          val start = i
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          // scientific notation: 1e308, 2.5E-3 (jq numbers are doubles)
          if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
            val j = if (i + 1 < s.length &&
              (s(i + 1) == '+' || s(i + 1) == '-')) i + 2 else i + 1
            if (j < s.length && s(j).isDigit) {
              i = j
              while (i < s.length && s(i).isDigit) i += 1
            }
          }
          push(s.substring(start, i))
        } else if (c == ':' && i + 1 < s.length && s(i + 1) == ':') {
          push("::"); i += 2
        } else if (c == '.' && i + 1 < s.length && s(i + 1) == '.') {
          push(".."); i += 2
        } else if (c == '@') { // @base64, @csv, … format filters
          val start = i
          i += 1
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          push(s.substring(start, i))
        } else if (c == '/' && i + 1 < s.length && s(i + 1) == '/') {
          if (i + 2 < s.length && s(i + 2) == '=') { push("//="); i += 3 }
          else { push("//"); i += 2 }
        } else if ("|+-*/%".contains(c) && i + 1 < s.length &&
          s(i + 1) == '=') { // |= += -= *= /= %=
          push(s.substring(i, i + 2)); i += 2
        } else if ("=!<>".contains(c) && i + 1 < s.length &&
          s(i + 1) == '=') {
          push(s.substring(i, i + 2)); i += 2
        } else { push(c.toString); i += 1 }
      }
      (out.toVector, lines.toVector)
    }
  }

  private[jq] object Tokens {
    /** Scan a double-quoted string literal starting at `i`, processing
      * backslash escapes (\" \\ \n \t \r \b \f \/ \uXXXX). Returns the token
      * (a leading quote + the unescaped content, no trailing quote) and the
      * index just past the closing quote.
      */
    def stringToken(s: String, i0: Int): (String, Int) = {
      val sb = new StringBuilder("\"")
      var i = i0 + 1
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'u' if i + 5 < s.length =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case '(' => // \( starts jq string interpolation: keep a
              // marker the parser splits on (NUL cannot occur in JSON text)
              sb += '\u0000'; sb += '('
              i += 2
            case e =>
              sb += (e match {
                case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
                case 'b' => '\b'; case 'f' => '\f'; case other => other
              })
              i += 2
          }
        } else { sb += s(i); i += 1 }
      }
      require(i < s.length, "unterminated string")
      (sb.toString, i + 1)
    }
  }
}
