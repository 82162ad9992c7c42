package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.json.{Cbor, Js, Wire}

/** The Kafka wire format (reference docs/serialisation.md:3 — RFC 7049
  * CBOR inside RFC 1952 gzip, string fallback): golden BYTES pin the
  * encoder (hand-assembled from the RFC, not round-tripped through our
  * own code), the liberal-decoder cases pin RFC corners, and the chain
  * tests pin the gunzip → CBOR → string fallback order.
  */
class CborSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val goldenJson = """{"a":1,"b":[true,null,"x"],"c":-2,"d":1.5}"""
  // RFC 7049 by hand: map(4){ "a":1, "b":[true,null,"x"], "c":-2,
  //                           "d":1.5(float64) }
  private val goldenBytes: Array[Byte] = Array(
    0xa4, // map of 4
    0x61, 'a', 0x01, // "a": 1
    0x61, 'b', 0x83, 0xf5, 0xf6, 0x61, 'x', // "b": [true, null, "x"]
    0x61, 'c', 0x21, // "c": -2
    0x61, 'd', 0xfb, 0x3f, 0xf8, 0, 0, 0, 0, 0, 0 // "d": 1.5
  ).map(_.toByte)

  test("encoder emits the exact RFC 7049 golden bytes") {
    assert(Cbor.encode(Js.parse(goldenJson)).toSeq == goldenBytes.toSeq)
  }

  test("decoder reads the golden bytes back to the same document") {
    // compare renders: Jackson's IntNode(1) != LongNode(1) even though
    // the documents are identical JSON
    assert(Js.render(Cbor.decode(goldenBytes)) == goldenJson)
  }

  test("liberal decode: indefinite lengths, half floats, tags, " +
    "64-bit unsigned") {
    // indefinite text: (_ "ab" "c")
    assert(Cbor.decode(Array(0x7f, 0x62, 'a', 'b', 0x61, 'c', 0xff)
      .map(_.toByte)).textValue() == "abc")
    // indefinite array: [_ 1, 2]
    assert(Js.render(Cbor.decode(Array(0x9f, 0x01, 0x02, 0xff)
      .map(_.toByte))) == "[1,2]")
    // indefinite map: {_ "k": 7}
    assert(Js.render(Cbor.decode(
      Array(0xbf, 0x61, 'k', 0x07, 0xff).map(_.toByte))) == """{"k":7}""")
    // half float 1.0 = 0xf9 3c00
    assert(Cbor.decode(Array(0xf9, 0x3c, 0x00).map(_.toByte))
      .doubleValue() == 1.0)
    // tag 0 (datetime) around a text string: tag drops, content stays
    assert(Cbor.decode(Array(0xc0, 0x61, 't').map(_.toByte))
      .textValue() == "t")
    // 2^64 - 1 (major 0, 8-byte arg) widens past Long
    val big = Array(0x1b, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff)
      .map(_.toByte)
    assert(Cbor.decode(big).bigIntegerValue() ==
      new java.math.BigInteger("18446744073709551615"))
    // trailing bytes after a complete item must FAIL (the guard that
    // keeps plain text from half-decoding as CBOR)
    intercept[IllegalArgumentException](
      Cbor.decode(Array(0x01, 0x02).map(_.toByte)))
  }

  test("wire chain: gzip-CBOR reads, plain string reads, gzip-string " +
    "reads, produce(toString) is the raw text") {
    val wire = Wire.produce(goldenJson, asString = false)
    assert(wire(0) == 0x1f.toByte && wire(1) == 0x8b.toByte,
      "produced values carry the gzip envelope")
    assert(Js.parse(Wire.consume(wire)) == Js.parse(goldenJson))
    // a golden wire message assembled WITHOUT the encoder (gzip of the
    // hand-written CBOR bytes) decodes to the same rows as the JSON path
    assert(Js.parse(Wire.consume(Wire.gzip(goldenBytes))) ==
      Js.parse(goldenJson))
    val text = """{"plain":"json string"}"""
    assert(Wire.consume(text.getBytes("UTF-8")) == text)
    assert(Wire.consume(Wire.gzip("not cbor at all".getBytes("UTF-8")))
      == "not cbor at all")
    assert(new String(Wire.produce(text, asString = true), "UTF-8")
      == text)
    // unicode survives the full chain
    val uni = """{"s":"héllo → 世界"}"""
    assert(Js.parse(Wire.consume(Wire.produce(uni, asString = false)))
      == Js.parse(uni))
  }

  test("produce is total over everything consume admits: non-JSON " +
    "text and bare JSON scalars pass through as raw UTF-8") {
    // a foreign producer's non-JSON value rode in via the string
    // fallback; the pass-through sink / $delay redelivery re-produce it
    val foreign = "plain text from a foreign producer"
    assert(new String(Wire.produce(foreign, asString = false), "UTF-8")
      == foreign)
    assert(Wire.consume(Wire.produce(foreign, asString = false))
      == foreign)
    // a valid-JSON SCALAR must not encode to CBOR (consume renders only
    // container top-levels — the bytes would come back as garbage)
    Seq("42", "\"quoted\"", "true", "null", "3.25").foreach { s =>
      assert(Wire.consume(Wire.produce(s, asString = false)) == s,
        s"scalar $s must round-trip verbatim")
    }
    // containers still take the wire format
    val obj = Wire.produce("""{"a":1}""", asString = false)
    assert(obj(0) == 0x1f.toByte && obj(1) == 0x8b.toByte)
    val arr = Wire.produce("""[1,2]""", asString = false)
    assert(arr(0) == 0x1f.toByte && arr(1) == 0x8b.toByte)
  }

  test("key-order contract: map entries encode in insertion order, " +
    "permuted keys are value-equal but not byte-equal") {
    val a = Js.parse("""{"x":1,"y":2}""")
    val b = Js.parse("""{"y":2,"x":1}""")
    // byte-level: insertion order is preserved, so the permutation
    // yields DIFFERENT wire bytes...
    assert(!java.util.Arrays.equals(Cbor.encode(a), Cbor.encode(b)))
    // ...and re-encoding the same text is byte-stable run over run
    assert(java.util.Arrays.equals(Cbor.encode(a),
      Cbor.encode(Js.parse("""{"x":1,"y":2}"""))))
    // value-level: decode → render is order-insensitive for consumers
    assert(Js.parse(Js.render(Cbor.decode(Cbor.encode(a)))) ==
      Js.parse(Js.render(Cbor.decode(Cbor.encode(b)))))
  }

  test("property: encode→decode round-trips arbitrary JSON documents " +
    "bit-for-bit (render compare)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val scalar: Gen[String] = Gen.oneOf(
      Gen.const("null"), Gen.const("true"), Gen.const("false"),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.choose(-1e12, 1e12).map(d => d.toString),
      Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
      Gen.oneOf("\"héllo\"", "\"日本語 text\"", "\"a\\nb\\t\\\"c\""))
    def value(depth: Int): Gen[String] =
      if (depth <= 0) scalar
      else Gen.frequency(
        3 -> scalar,
        1 -> Gen.listOfN(3, value(depth - 1))
          .map(_.mkString("[", ",", "]")),
        1 -> Gen.listOfN(3, Gen.zip(Gen.alphaNumStr.map(_.take(6)),
          value(depth - 1)))
          .map(_.zipWithIndex.map { case ((k, v), i) =>
            "\"" + k + i + "\":" + v }.mkString("{", ",", "}")))
    val doc = value(3)
    var seed = Seed(1337L)
    (0 until 200).foreach { _ =>
      val json = doc.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val n = Js.parse(json)
      val back = Cbor.decode(Cbor.encode(n))
      assert(Js.render(back) == Js.render(n),
        s"round trip diverged for $json")
      // and through the full wire chain, including gzip
      assert(Wire.consume(Wire.produce(Js.render(n), asString = false))
        == Js.render(n) ||
        !(n.isObject || n.isArray), // scalar top-levels read as text
        s"wire chain diverged for $json")
    }
  }

  test("Kafka value path: encode/decode UDFs round-trip the frame and " +
    "match the string path row for row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.KafkaIo
    val docs = Seq(
      """{"doc_id":1,"text":"spark shuffles"}""",
      """{"doc_id":2,"text":"plain row"}""",
      """{"doc_id":3}""").toDF("value")
    val viaWire = docs
      .select(KafkaIo.wireDecode(KafkaIo.wireEncode(col("value")))
        .as("value"))
      .select(from_json(col("value"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .as("v")).select("v.*")
    val viaString = docs
      .select(from_json(col("value"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "doc_id BIGINT, text STRING"))
        .as("v")).select("v.*")
    assert(viaWire.collect().toSeq.sortBy(_.getLong(0)) ==
      viaString.collect().toSeq.sortBy(_.getLong(0)))
  }
}
