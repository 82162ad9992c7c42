package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step itself is a STUB (no image/audio codecs in this
  * environment): `FakeDecoder` derives deterministic "dimensions" from the
  * leading payload bytes. Everything around it — the binary column, the
  * metadata struct, the per-partition batched iteration (the Scala
  * equivalent of mapInPandas: one decoder instance per partition, rows
  * streamed through it), and the resulting schema — is the real plumbing a
  * codec would drop into.
  */
object Multimodal {

  /** Wrap a text column as an opaque binary payload + metadata struct —
    * stands in for reading image/audio bytes alongside typed metadata.
    */
  def pack(df: DataFrame, textCol: String, fmtCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast(BinaryType))
      .withColumn("media_meta",
        struct(col(fmtCol).as("format"),
          octet_length(col(textCol).cast(BinaryType)).as("n_bytes")))

  /** The decode seam. PPM images (P6 binary / P3 ASCII) decode FOR REAL —
    * a complete pure-JVM codec, no external libraries — which proves the
    * whole decode path end to end; other formats (jpeg/png/audio, whose
    * codecs aren't in this environment) fall back to the documented
    * deterministic stub below.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Long, Seq[Int]) = {
      val w = if (payload.length > 0) payload(0) & 0xff else 0
      val h = if (payload.length > 1) payload(1) & 0xff else 0
      val sample = payload.take(4).map(_ & 0xff).toSeq
      (w, h, w.toLong * h.toLong, sample)
    }
  }

  /** Pure-JVM PPM codec + basic features (grayscale, nearest-neighbor
    * resize, mean luma) — the operations a training-data image pipeline
    * runs after decode.
    */
  object Ppm {
    final case class Image(width: Int, height: Int, rgb: Array[Int])

    /** P6 (binary) or P3 (ASCII), maxval ≤ 255, `#` comments allowed. */
    def decode(payload: Array[Byte]): Option[Image] = {
      if (payload.length < 2 || payload(0) != 'P') return None
      val binary = payload(1) == '6'
      if (!binary && payload(1) != '3') return None
      var i = 2
      def skipWs(): Unit = {
        var more = true
        while (more && i < payload.length) {
          val c = payload(i).toChar
          if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
          else if (c.isWhitespace) i += 1
          else more = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        while (i < payload.length && payload(i).toChar.isDigit) {
          v = v * 10 + (payload(i) - '0'); i += 1
        }
        v
      }
      val (w, h, maxval) = (int(), int(), int())
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      val n = w * h
      val rgb = new Array[Int](n)
      if (binary) {
        i += 1 // single whitespace after maxval
        if (payload.length - i < n * 3) return None
        var p = 0
        while (p < n) {
          rgb(p) = ((payload(i) & 0xff) << 16) |
            ((payload(i + 1) & 0xff) << 8) | (payload(i + 2) & 0xff)
          i += 3; p += 1
        }
      } else {
        var p = 0
        while (p < n) {
          val (r, g, b) = (int(), int(), int())
          rgb(p) = (r << 16) | (g << 8) | b
          p += 1
        }
      }
      Some(Image(w, h, rgb))
    }

    /** Integer BT.601-ish luma per pixel. */
    def luma(img: Image): Array[Int] =
      img.rgb.map { p =>
        val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        (r * 299 + g * 587 + b * 114) / 1000
      }

    def meanLuma(img: Image): Double = {
      val l = luma(img)
      if (l.isEmpty) 0.0 else l.map(_.toLong).sum.toDouble / l.length
    }

    def resizeNearest(img: Image, w: Int, h: Int): Image = {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = y * img.height / h
        var x = 0
        while (x < w) {
          out(y * w + x) = img.rgb(sy * img.width + x * img.width / w)
          x += 1
        }
        y += 1
      }
      Image(w, h, out)
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("frame_sample", ArrayType(IntegerType))))

  /** Per-partition decode: the batch shape a real codec needs (decoder
    * init once per partition, rows streamed). Equivalent of a Pandas UDF /
    * mapInPandas pipeline stage in the Scala API.
    */
  def decode(packed: DataFrame, idCol: String): DataFrame = {
    val input = packed.select(col(idCol).cast(LongType), col("media_meta.format"),
      col("media_meta.n_bytes"), col("payload"))
    input.mapPartitions { rows =>
      // decoder/codec initialization would happen here, once per partition
      rows.map { r =>
        val (w, h, np, sample) = FakeDecoder.decode(r.getAs[Array[Byte]](3))
        Row(r.getLong(0), r.getString(1), r.getInt(2), w, h, np, sample)
      }
    }(RowEncoder.encoderFor(decodedSchema))
  }

  private val imageSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("mean_luma", DoubleType),
    StructField("thumb_luma", ArrayType(IntegerType)),
    StructField("decoded", BooleanType)))

  /** Real image decode + feature extraction over PPM payloads: dimensions,
    * mean luma, a thumbWxH nearest-neighbor luma thumbnail (the
    * embedding-ish fixed-size feature a training pipeline feeds
    * downstream). Non-PPM payloads report decoded=false with nulled
    * features — the filter predicate a 100 TB sweep needs to quarantine
    * undecodable media without failing the job.
    */
  def decodeImages(packed: DataFrame, idCol: String,
      thumbW: Int = 4, thumbH: Int = 4): DataFrame = {
    val input = packed.select(col(idCol).cast(LongType),
      col("media_meta.format"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        Ppm.decode(r.getAs[Array[Byte]](2)) match {
          case Some(img) =>
            val thumb = Ppm.luma(Ppm.resizeNearest(img, thumbW, thumbH)).toSeq
            Row(r.getLong(0), r.getString(1), img.width, img.height,
              img.width.toLong * img.height, Ppm.meanLuma(img), thumb, true)
          case None =>
            Row(r.getLong(0), r.getString(1), null, null, null, null, null,
              false)
        }
      }
    }(RowEncoder.encoderFor(imageSchema))
  }
}
