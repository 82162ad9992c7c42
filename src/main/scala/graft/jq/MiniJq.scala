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

  sealed trait Ast
  case object Identity extends Ast
  final case class Path(parts: List[Step]) extends Ast
  final case class Lit(value: JsonNode) extends Ast
  final case class Pipe(stages: List[Ast]) extends Ast
  final case class Comma(items: List[Ast]) extends Ast
  final case class BinOp(op: String, l: Ast, r: Ast) extends Ast
  final case class ObjCons(fields: List[(String, Ast)]) extends Ast
  final case class ArrCons(items: List[Ast]) extends Ast
  final case class Del(path: Path) extends Ast
  final case class Call(ns: Option[String], name: String,
      args: List[Ast] = Nil) extends Ast
  final case class IfElse(cond: Ast, thn: Ast, els: Ast) extends Ast
  final case class StrInterp(parts: List[Either[String, Ast]]) extends Ast
  final case class VarRef(name: String) extends Ast
  final case class Bind(src: Ast, name: String, rest: Ast) extends Ast
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
    input => eval(prog.body, input, prog.defs, Map.empty)
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
    Program(defs.toMap, if (t.peek == null) Identity else parseExpr(t))
  }

  private def parseExpr(t: Tokens): Ast = {
    val head = parseComma(t)
    if (t.peekIs("as")) { // EXPR as $x | REST — binds each output of EXPR
      t.expect("as"); t.expect("$")
      val name = t.ident()
      t.expect("|")
      Bind(head, name, parseExpr(t))
    } else {
      val stages = mutable.ListBuffer(head)
      while (t.peekIs("|")) { t.expect("|"); stages += parseComma(t) }
      if (stages.size == 1) stages.head else Pipe(stages.toList)
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
    var l = parseCmp(t)
    while (t.peekIs("//")) { t.next(); l = BinOp("//", l, parseCmp(t)) }
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
    while (t.peekIs("*") || t.peekIs("/")) {
      val op = t.next()
      l = BinOp(op, l, parsePostfix(t))
    }
    l
  }

  /** `EXPR?` suppresses errors, like `try EXPR`. */
  private def parsePostfix(t: Tokens): Ast = {
    var l = parsePrimary(t)
    while (t.peekIs("?")) { t.next(); l = TryOp(l, None) }
    l
  }

  /** `.a.b[0][].c` after the leading dot: fields, indexes, iterations. */
  private def parseSteps(t: Tokens, leadIdent: Boolean): List[Step] = {
    val parts = mutable.ListBuffer.empty[Step]
    if (leadIdent) parts += Field(t.ident())
    var more = true
    while (more) {
      if (t.peekIs("[")) {
        t.next()
        if (t.peekIs("]")) { t.next(); parts += IterateStep }
        else { parts += Index(t.next().toInt); t.expect("]") }
      } else if (t.peekIs(".") && { t.mark(); t.next(); val ok = t.peekIdent; t.reset(); ok }) {
        t.next(); parts += Field(t.ident())
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
      val fields = mutable.ListBuffer[(String, Ast)]()
      while (!t.peekIs("}")) {
        val key = if (t.peekString) t.string() else t.ident()
        t.expect(":")
        fields += key -> parseObjVal(t)
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
      t.next()
      val v = VarRef(t.ident())
      // postfix path on a variable: $x.v, $x[0]
      if (t.peekIs(".") && { t.mark(); t.next(); val ok = t.peekIdent; t.reset(); ok }) {
        t.next()
        Pipe(List(v, Path(parseSteps(t, leadIdent = true))))
      } else if (t.peekIs("["))
        Pipe(List(v, Path(parseSteps(t, leadIdent = false))))
      else v
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
      val cond = parseExpr(t)
      t.expect("then")
      val thn = parseExpr(t)
      val els =
        if (t.peekIs("else")) { t.next(); parseExpr(t) }
        else Identity // JQ: missing else passes the input through
      t.expect("end")
      IfElse(cond, thn, els)
    case "del" =>
      t.next(); t.expect("(")
      t.expect(".")
      val parts = mutable.ListBuffer[Step](Field(t.ident()))
      while (t.peekIs(".")) { t.next(); parts += Field(t.ident()) }
      t.expect(")")
      Del(Path(parts.toList))
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

  private def step(n: JsonNode, p: Step): Seq[JsonNode] = p match {
    case Field(f) =>
      if (n == null || n.isNull) Seq(NullNode.getInstance)
      else Seq(Option(n.get(f)).getOrElse(NullNode.getInstance))
    case Index(i) =>
      if (n == null || n.isNull) Seq(NullNode.getInstance)
      else Seq(Option(n.get(i)).getOrElse(NullNode.getInstance))
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
          throw new IllegalArgumentException(s"undefined variable $$$name")))
      case Bind(src, name, rest) =>
        eval(src, in, defs, vars).flatMap(v =>
          eval(rest, in, defs, vars + (name -> v)))
      case Foreach(src, name, init, update, extract) =>
        eval(init, in, defs, vars).flatMap { init0 =>
          var acc = init0
          eval(src, in, defs, vars).flatMap { v =>
            val bound = vars + (name -> v)
            acc = eval(update, acc, defs, bound).lastOption
              .getOrElse(NullNode.getInstance)
            extract match {
              case Some(e) => eval(e, acc, defs, bound)
              case None    => Seq(acc)
            }
          }
        }
      case TryOp(body, handler) =>
        try eval(body, in, defs, vars)
        catch {
          case e: Exception =>
            handler match {
              case Some(h) =>
                eval(h, TextNode.valueOf(
                  Option(e.getMessage).getOrElse("error")), defs, vars)
              case None => Seq.empty
            }
        }
      case Reduce(src, name, init, update) =>
        eval(init, in, defs, vars).map { init0 =>
          eval(src, in, defs, vars).foldLeft(init0) { (acc, v) =>
            eval(update, acc, defs, vars + (name -> v)).lastOption
              .getOrElse(NullNode.getInstance)
          }
        }
      case Pipe(stages) =>
        stages.foldLeft(Seq(in))((ns, s) => ns.flatMap(eval(s, _, defs, vars)))
      case Comma(items) => items.flatMap(eval(_, in, defs, vars))
      case ObjCons(fields) =>
        fields.foldLeft(Seq(Js.obj())) { case (objs, (k, e)) =>
          for { o <- objs; v <- eval(e, in, defs, vars) } yield {
            val c = o.deepCopy[ObjectNode]()
            c.set[JsonNode](k, v)
            c
          }
        }
      case ArrCons(items) =>
        val a = Js.arr()
        items.foreach(e => eval(e, in, defs, vars).foreach(a.add))
        Seq(a)
      case Del(Path(parts)) =>
        val out = in.deepCopy[JsonNode]()
        val fieldNames = parts.collect { case Field(f) => f }
        val parent = fieldNames.init.foldLeft(out)((n, p) =>
          Option(n.get(p)).getOrElse(NullNode.getInstance))
        parent match {
          case o: ObjectNode => o.remove(fieldNames.last)
          case _             =>
        }
        Seq(out)
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

  /** The jq builtins the subset supports. `map`/`select`/`empty` are
    * stream operations — trivial on the stream evaluator.
    */
  private def builtinFn(name: String, args: List[Ast], in: JsonNode,
      defs: Map[String, FnDef],
      vars: Map[String, JsonNode]): Seq[JsonNode] = name match {
    case "empty" => Seq.empty
    case "not"   => Seq(BooleanNode.valueOf(!truthyJq(in)))
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
    case "values" =>
      Seq { val a = Js.arr(); Js.fields(in).foreach(f => a.add(f._2)); a }
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
      Seq(step(in, IterateStep).lastOption.getOrElse(NullNode.getInstance))
    case "range" =>
      if (args.size >= 2)
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
      eval(args.head, in, defs, vars).map(re =>
        BooleanNode.valueOf(
          java.util.regex.Pattern.compile(re.asText())
            .matcher(in.asText()).find()))
    case "capture" => // named groups -> object
      eval(args.head, in, defs, vars).map { re =>
        val p = java.util.regex.Pattern.compile(re.asText())
        val m = p.matcher(in.asText())
        val o = Js.obj()
        if (m.find()) {
          val names = "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r
            .findAllMatchIn(re.asText()).map(_.group(1))
          names.foreach(n =>
            Option(m.group(n)).foreach(v => o.put(n, v)))
        }
        o: JsonNode
      }
    case "sub" | "gsub" =>
      for {
        re <- eval(args.head, in, defs, vars)
        repl <- eval(args(1), in, defs, vars)
      } yield {
        val p = java.util.regex.Pattern.compile(re.asText())
        val m = p.matcher(in.asText())
        val quoted = java.util.regex.Matcher.quoteReplacement(repl.asText())
        TextNode.valueOf(
          if (name == "sub") m.replaceFirst(quoted)
          else m.replaceAll(quoted))
      }
    case "split" =>
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
    case other =>
      throw new IllegalArgumentException(s"undefined filter $other")
  }

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
        }
      case _ =>
        throw new IllegalArgumentException(s"cannot apply $op to $l, $r")
    }

  // -- tokenizer ------------------------------------------------------------

  private final class Tokens(script: String) {
    private val tokens: Vector[String] = tokenize(script)
    private var pos = 0
    private var marked = 0

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

    private def tokenize(s: String): Vector[String] = {
      val out = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < s.length) {
        val c = s(i)
        if (c.isWhitespace) i += 1
        else if (c == '#') { while (i < s.length && s(i) != '\n') i += 1 }
        else if (c == '"') {
          val (tok, after) = Tokens.stringToken(s, i)
          out += tok; i = after
        } else if (c.isLetter || c == '_') {
          val start = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
          out += s.substring(start, i)
        } else if (c.isDigit) {
          val start = i
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          out += s.substring(start, i)
        } else if (c == ':' && i + 1 < s.length && s(i + 1) == ':') {
          out += "::"; i += 2
        } else if (c == '/' && i + 1 < s.length && s(i + 1) == '/') {
          out += "//"; i += 2
        } else if ("=!<>".contains(c) && i + 1 < s.length &&
          s(i + 1) == '=') {
          out += s.substring(i, i + 2); i += 2
        } else { out += c.toString; i += 1 }
      }
      out.toVector
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
