package graft.json

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** RFC 7049 (CBOR) codec over the Jackson tree — the reference's Kafka
  * wire format is gzip-compressed CBOR with a plain-string fallback
  * (/root/reference/docs/serialisation.md:3; RFC 7049 + RFC 1952, both
  * public). Only the JSON-expressible subset is ever PRODUCED (definite
  * lengths, UTF-8 text keys, 64-bit ints, float64); the DECODER is
  * liberal per the RFC: indefinite-length strings/arrays/maps,
  * half/single/double floats, tags (contents kept, tag dropped), byte
  * strings (surfaced as Jackson binary → base64 in JSON renders), and
  * 64-bit unsigned values beyond Long (widened to BigInteger). A decode
  * must consume the buffer exactly — trailing bytes fail the parse, so
  * plain text that happens to start with a valid CBOR prefix can never
  * half-decode into a wrong document (the chain then falls back to the
  * string reading).
  */
object Cbor {

  // ---------------- encode ----------------

  /** KEY-ORDER CONTRACT: map entries encode in the Jackson tree's
    * INSERTION order — no canonical re-sort. Every producer path in
    * this engine builds the tree from JSON text whose key order is
    * itself deterministic (`to_json(struct(...))` is column order;
    * `Js.parse` preserves text order), so produced bytes are
    * byte-for-byte reproducible run over run. A future producer that
    * assembles nodes in a different order emits permuted-but-EQUAL
    * documents: consumers are unaffected (decode → JSON is order-
    * insensitive at the value level), but byte-level golden tests and
    * content-hash dedup over wire bytes would silently split — keep
    * insertion order stable or hash the RENDERED JSON, never the wire
    * bytes (CborSpec pins both halves of this contract).
    */
  def encode(n: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(n, out)
    out.toByteArray
  }

  private def head(major: Int, arg: Long, out: ByteArrayOutputStream): Unit = {
    val m = major << 5
    if (arg < 24) out.write(m | arg.toInt)
    else if (arg <= 0xffL) { out.write(m | 24); out.write(arg.toInt) }
    else if (arg <= 0xffffL) {
      out.write(m | 25); out.write((arg >> 8).toInt); out.write(arg.toInt)
    } else if (arg <= 0xffffffffL) {
      out.write(m | 26)
      var s = 24
      while (s >= 0) { out.write((arg >> s).toInt & 0xff); s -= 8 }
    } else {
      out.write(m | 27)
      var s = 56
      while (s >= 0) { out.write((arg >> s).toInt & 0xff); s -= 8 }
    }
  }

  private def write(n: JsonNode, out: ByteArrayOutputStream): Unit = n match {
    case o: ObjectNode =>
      head(5, o.size().toLong, out)
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey.getBytes(UTF_8)
        head(3, k.length.toLong, out); out.write(k)
        write(e.getValue, out)
      }
    case a: ArrayNode =>
      head(4, a.size().toLong, out)
      val it = a.elements()
      while (it.hasNext) write(it.next(), out)
    case t: TextNode =>
      val b = t.textValue().getBytes(UTF_8)
      head(3, b.length.toLong, out); out.write(b)
    case b: BinaryNode =>
      val bytes = b.binaryValue()
      head(2, bytes.length.toLong, out); out.write(bytes)
    case x if x.isIntegralNumber && x.canConvertToLong =>
      val v = x.longValue()
      if (v >= 0) head(0, v, out) else head(1, -1L - v, out)
    case x if x.isNumber =>
      // doubles, decimals, and over-long integers all travel as float64
      // (the JSON-expressible produce subset)
      out.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(x.doubleValue())
      var s = 56
      while (s >= 0) { out.write((bits >> s).toInt & 0xff); s -= 8 }
    case b: BooleanNode => out.write(if (b.booleanValue()) 0xf5 else 0xf4)
    case _ => out.write(0xf6) // null / missing
  }

  // ---------------- decode ----------------

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def byte(): Int = {
      require(pos < bytes.length, "cbor: truncated")
      val b = bytes(pos) & 0xff; pos += 1; b
    }
    def take(n: Long): Array[Byte] = {
      require(n >= 0 && n <= bytes.length - pos, "cbor: length overruns")
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt)
      pos += n.toInt; a
    }
    def unsigned(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | byte(); i += 1 }
      v
    }
  }

  def decode(bytes: Array[Byte]): JsonNode = {
    val r = new Reader(bytes)
    val n = item(r)
    require(r.pos == bytes.length,
      s"cbor: ${bytes.length - r.pos} trailing bytes")
    n
  }

  /** Decodes one data item; returns null ONLY for the 0xff break code
    * (callers inside indefinite containers check for it).
    */
  private def item(r: Reader): JsonNode = {
    val ib = r.byte()
    if (ib == 0xff) return null // break
    val major = ib >>> 5
    val info = ib & 0x1f
    def arg(): Long = info match {
      case 24 => r.unsigned(1)
      case 25 => r.unsigned(2)
      case 26 => r.unsigned(4)
      case 27 => r.unsigned(8)
      case x if x < 24 => x.toLong
      case _ => throw new IllegalArgumentException(
        s"cbor: bad additional info $info for major $major")
    }
    major match {
      case 0 =>
        val v = arg()
        if (v >= 0) LongNode.valueOf(v)
        else BigIntegerNode.valueOf( // 64-bit unsigned past Long.Max
          java.math.BigInteger.valueOf(v).add(
            java.math.BigInteger.ONE.shiftLeft(64)))
      case 1 =>
        val v = arg()
        if (v >= 0) LongNode.valueOf(-1L - v)
        else BigIntegerNode.valueOf(
          java.math.BigInteger.valueOf(-1).subtract(
            java.math.BigInteger.valueOf(v).add(
              java.math.BigInteger.ONE.shiftLeft(64))))
      case 2 =>
        if (info == 31) BinaryNode.valueOf(chunks(r, 2))
        else BinaryNode.valueOf(r.take(arg()))
      case 3 =>
        if (info == 31) TextNode.valueOf(new String(chunks(r, 3), UTF_8))
        else TextNode.valueOf(new String(r.take(arg()), UTF_8))
      case 4 =>
        val a = Js.arr()
        if (info == 31) {
          var e = item(r)
          while (e != null) { a.add(e); e = item(r) }
        } else {
          val n = arg()
          var i = 0L
          while (i < n) { a.add(require2(item(r))); i += 1 }
        }
        a
      case 5 =>
        val o = Js.obj()
        def put(k: JsonNode, v: JsonNode): Unit = {
          o.set[JsonNode](
            if (k.isTextual) k.textValue() else Js.render(k), v)
          ()
        }
        if (info == 31) {
          var k = item(r)
          while (k != null) { put(k, require2(item(r))); k = item(r) }
        } else {
          val n = arg()
          var i = 0L
          while (i < n) { put(require2(item(r)), require2(item(r))); i += 1 }
        }
        o
      case 6 => // tag: keep the content, drop the semantic tag
        arg(); require2(item(r))
      case 7 =>
        info match {
          case 20 => BooleanNode.FALSE
          case 21 => BooleanNode.TRUE
          case 22 | 23 => NullNode.instance
          case 24 => r.byte(); NullNode.instance // simple value
          case 25 => DoubleNode.valueOf(halfToDouble(r.unsigned(2).toInt))
          case 26 => DoubleNode.valueOf(
            java.lang.Float.intBitsToFloat(r.unsigned(4).toInt).toDouble)
          case 27 => DoubleNode.valueOf(
            java.lang.Double.longBitsToDouble(r.unsigned(8)))
          case x if x < 20 => NullNode.instance // unassigned simple
          case _ => throw new IllegalArgumentException(
            s"cbor: bad float/simple info $info")
        }
    }
  }

  private def require2(n: JsonNode): JsonNode = {
    require(n != null, "cbor: unexpected break")
    n
  }

  private def chunks(r: Reader, major: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var ib = r.byte()
    while (ib != 0xff) {
      require(ib >>> 5 == major && (ib & 0x1f) != 31,
        "cbor: bad indefinite chunk")
      val info = ib & 0x1f
      val n = info match {
        case 24 => r.unsigned(1)
        case 25 => r.unsigned(2)
        case 26 => r.unsigned(4)
        case 27 => r.unsigned(8)
        case x => x.toLong
      }
      out.write(r.take(n))
      ib = r.byte()
    }
    out.toByteArray
  }

  /** IEEE 754 half → double (RFC 7049 App. D). */
  private def halfToDouble(half: Int): Double = {
    val exp = (half >> 10) & 0x1f
    val mant = half & 0x3ff
    val v =
      if (exp == 0) math.pow(2, -24) * mant
      else if (exp != 31) math.pow(2, exp - 25) * (mant + 1024)
      else if (mant == 0) Double.PositiveInfinity
      else Double.NaN
    if ((half & 0x8000) != 0) -v else v
  }
}

/** The Kafka VALUE wire chain (docs/serialisation.md:3): produce =
  * gzip(cbor(json)) — or the raw UTF-8 text when the part sets
  * `toString` — and consume = gunzip → CBOR → JSON render, falling back
  * to the string reading when the bytes are not gzip-CBOR. The fallback
  * makes the decoder total: a topic carrying a mix of wire messages and
  * plain JSON strings (e.g. produced by `toString` parts, test
  * harnesses, or foreign producers) reads correctly row by row.
  */
object Wire {

  /** `produce` mirrors `consume`'s container-top-level rule so the two
    * are TOTAL inverses over everything consume admits: only a JSON
    * OBJECT/ARRAY travels as gzip-CBOR (reference messages are
    * `Message<String, JsonObject>`), while non-JSON text (a foreign
    * producer's value that rode in via the string fallback) and bare
    * JSON scalars pass through as raw UTF-8. Encoding a scalar would
    * round-trip as undecodable bytes (consume only renders container
    * top-levels) and a parse failure in the pass-through sink path or
    * `$delay` redelivery would permanently fail the micro-batch.
    */
  def produce(json: String, asString: Boolean): Array[Byte] =
    if (json == null) null
    else if (asString) json.getBytes(UTF_8)
    else {
      val node =
        try Some(Js.parse(json)) catch { case _: Exception => None }
      node match {
        case Some(n) if n.isObject || n.isArray => gzip(Cbor.encode(n))
        case _ => json.getBytes(UTF_8)
      }
    }

  def consume(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    if (bytes.length > 2 && bytes(0) == 0x1f.toByte &&
        bytes(1) == 0x8b.toByte) {
      val unzipped =
        try Some(gunzip(bytes))
        catch { case _: Exception => None }
      unzipped match {
        case Some(b) =>
          // gzip envelope present: CBOR first, else the gunzipped text
          // (a gzip'd plain string is not a reference format, but
          // reading it beats erroring). Messages are JSON OBJECTS
          // (reference Message<String, JsonObject>), so only container
          // top-levels count as wire CBOR — an ASCII string whose
          // first byte mimics a CBOR text header must not half-read
          // as a bare scalar document.
          try {
            val n = Cbor.decode(b)
            if (n.isObject || n.isArray) Js.render(n)
            else new String(b, UTF_8)
          } catch { case _: Exception => new String(b, UTF_8) }
        case None => new String(bytes, UTF_8)
      }
    } else new String(bytes, UTF_8)
  }

  def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
