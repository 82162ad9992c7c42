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

  /** The ??? seam: a real implementation would decode image bytes here.
    * Deterministic fake: width/height from the first two bytes, a "frame
    * sample" of the first four bytes.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Long, Seq[Int]) = {
      val w = if (payload.length > 0) payload(0) & 0xff else 0
      val h = if (payload.length > 1) payload(1) & 0xff else 0
      val sample = payload.take(4).map(_ & 0xff).toSeq
      (w, h, w.toLong * h.toLong, sample)
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
}
