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

  sealed trait Ast
  case object Identity extends Ast
  final case class Path(parts: List[String]) extends Ast
  final case class Lit(value: JsonNode) extends Ast
  final case class Pipe(stages: List[Ast]) extends Ast
  final case class BinOp(op: String, l: Ast, r: Ast) extends Ast
  final case class ObjCons(fields: List[(String, Ast)]) extends Ast
  final case class ArrCons(items: List[Ast]) extends Ast
  final case class Del(path: Path) extends Ast
  final case class Call(ns: Option[String], name: String) extends Ast
  final case class IfElse(cond: Ast, thn: Ast, els: Ast) extends Ast

  final case class Program(defs: Map[String, Ast], body: Ast)

  /** Compile a script; `load` resolves import paths to script text.
    * `base` is the app-root-relative path of this script, so nested
    * imports resolve against its directory.
    */
  def compile(script: String,
      load: String => String = f =>
        throw new IllegalArgumentException(s"no script loader for $f"),
      base: String = ""): JsonNode => JsonNode = {
    val prog = parse(script, load, base)
    input => eval(prog.body, input, prog.defs)
  }

  // -- parser ---------------------------------------------------------------

  private def parse(script: String, load: String => String,
      base: String = ""): Program = {
    val t = new Tokens(script)
    val defs = mutable.Map[String, Ast]()
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
        val name = t.ident(); t.expect(":")
        val body = parseExpr(t)
        t.expect(";")
        defs(name) = body
      } else more = false
    }
    // defs-only scripts (imported libraries) have no body
    Program(defs.toMap, if (t.peek == null) Identity else parseExpr(t))
  }

  private def parseExpr(t: Tokens): Ast = {
    val stages = mutable.ListBuffer(parseCmp(t))
    while (t.peekIs("|")) { t.expect("|"); stages += parseCmp(t) }
    if (stages.size == 1) stages.head else Pipe(stages.toList)
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
    var l = parsePrimary(t)
    while (t.peekIs("*") || t.peekIs("/")) {
      val op = t.next()
      l = BinOp(op, l, parsePrimary(t))
    }
    l
  }

  private def parsePrimary(t: Tokens): Ast = t.peek match {
    case "." =>
      t.next()
      if (t.peekIdent) {
        val parts = mutable.ListBuffer(t.ident())
        while (t.peekIs(".") && { t.mark(); t.next(); val ok = t.peekIdent; t.reset(); ok }) {
          t.next(); parts += t.ident()
        }
        Path(parts.toList)
      } else Identity
    case "{" =>
      t.next()
      val fields = mutable.ListBuffer[(String, Ast)]()
      while (!t.peekIs("}")) {
        val key = if (t.peekString) t.string() else t.ident()
        t.expect(":")
        fields += key -> parseExpr(t)
        if (t.peekIs(",")) t.next()
      }
      t.expect("}")
      ObjCons(fields.toList)
    case "[" =>
      t.next()
      val items = mutable.ListBuffer[Ast]()
      while (!t.peekIs("]")) {
        items += parseExpr(t)
        if (t.peekIs(",")) t.next()
      }
      t.expect("]")
      ArrCons(items.toList)
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
      val parts = mutable.ListBuffer(t.ident())
      while (t.peekIs(".")) { t.next(); parts += t.ident() }
      t.expect(")")
      Del(Path(parts.toList))
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
      val name = t.ident()
      if (t.peekIs("::")) { t.next(); Call(Some(name), t.ident()) }
      else Call(None, name)
  }

  // -- evaluator ------------------------------------------------------------

  private def eval(ast: Ast, in: JsonNode, defs: Map[String, Ast]): JsonNode =
    ast match {
      case Identity => in
      case Path(parts) =>
        parts.foldLeft(in)((n, p) =>
          if (n == null || n.isNull) NullNode.getInstance
          else Option(n.get(p)).getOrElse(NullNode.getInstance))
      case Lit(v)       => v
      case Pipe(stages) => stages.foldLeft(in)((n, s) => eval(s, n, defs))
      case ObjCons(fields) =>
        val o = Js.obj()
        fields.foreach { case (k, e) => o.set[JsonNode](k, eval(e, in, defs)) }
        o
      case ArrCons(items) =>
        val a = Js.arr()
        items.foreach(e => a.add(eval(e, in, defs)))
        a
      case Del(Path(parts)) =>
        val out = in.deepCopy[JsonNode]()
        val parent = parts.init.foldLeft(out)((n, p) =>
          Option(n.get(p)).getOrElse(NullNode.getInstance))
        parent match {
          case o: ObjectNode => o.remove(parts.last)
          case _             =>
        }
        out
      case Call(ns, name) =>
        val key = ns.map(n => s"$n::$name").getOrElse(name)
        val body = defs.getOrElse(key,
          throw new IllegalArgumentException(s"undefined filter $key"))
        eval(body, in, defs)
      case IfElse(cond, thn, els) =>
        val c = eval(cond, in, defs)
        // JQ truthiness: false and null are falsy, everything else truthy
        if (c.isNull || (c.isBoolean && !c.asBoolean())) eval(els, in, defs)
        else eval(thn, in, defs)
      case BinOp(op, l, r) =>
        binop(op, eval(l, in, defs), eval(r, in, defs))
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
          "if", "then", "else", "end", "elif")(peek)
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
