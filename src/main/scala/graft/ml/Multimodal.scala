package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  /** Pure-JVM RIFF/WAVE codec (PCM 16-bit little-endian) + the basic
    * features an audio curation pipeline derives after decode (duration,
    * RMS energy, peak). Like `Ppm`, this is a REAL codec for the one
    * container simple enough to need no external library — it proves the
    * audio decode path end to end; compressed codecs would drop into the
    * same seam.
    */
  object Wav {
    final case class Audio(sampleRate: Int, channels: Int,
        samples: Array[Short])

    /** Canonical 44-byte-header PCM WAV. */
    def encode(a: Audio): Array[Byte] = {
      val dataLen = a.samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16)
        .putShort(1) // PCM
        .putShort(a.channels.toShort)
        .putInt(a.sampleRate)
        .putInt(a.sampleRate * a.channels * 2) // byte rate
        .putShort((a.channels * 2).toShort) // block align
        .putShort(16) // bits per sample
      bb.put("data".getBytes).putInt(dataLen)
      a.samples.foreach(bb.putShort)
      bb.array()
    }

    /** Parse RIFF/WAVE with chunk walking (fmt may be followed by LIST or
      * other chunks before data). PCM 16-bit only; anything else — and
      * ANY structurally corrupt payload (undersized fmt, chunk lengths
      * past the buffer, odd tails) — returns None, never throws: one bad
      * row must quarantine, not kill the task.
      */
    def decode(payload: Array[Byte]): Option[Audio] =
      try {
        if (payload.length < 44) return None
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
        }
        if (tag() != "RIFF") return None
        bb.getInt // riff size
        if (tag() != "WAVE") return None
        var rate, channels, bits = 0
        var samples: Array[Short] = null
        while (bb.remaining() >= 8) {
          val id = tag()
          val len = bb.getInt
          if (len < 0 || len > bb.remaining()) return None
          id match {
            case "fmt " =>
              if (len < 16) return None
              val fmt = bb.getShort
              channels = bb.getShort
              rate = bb.getInt
              bb.getInt; bb.getShort // byte rate, block align
              bits = bb.getShort
              if (fmt != 1 || bits != 16) return None
              bb.position(bb.position() + len - 16)
            case "data" =>
              samples = new Array[Short](len / 2)
              bb.asShortBuffer().get(samples)
              bb.position(bb.position() + len)
            case _ => // LIST/fact/...: skip (word-aligned)
              bb.position(math.min(bb.limit(),
                bb.position() + len + (len & 1)))
          }
        }
        if (rate <= 0 || channels <= 0 || samples == null) None
        else Some(Audio(rate, channels, samples))
      } catch {
        case _: RuntimeException => None // underflow/position on corrupt data
      }

    def durationMs(a: Audio): Long =
      a.samples.length.toLong / a.channels * 1000 / a.sampleRate

    def rms(a: Audio): Double =
      if (a.samples.isEmpty) 0.0
      else math.sqrt(a.samples.map(s => s.toDouble * s).sum /
        a.samples.length)

    def peak(a: Audio): Int =
      if (a.samples.isEmpty) 0 else a.samples.map(s => math.abs(s.toInt)).max
  }

  private val audioSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("duration_ms", LongType),
    StructField("rms", DoubleType),
    StructField("peak", IntegerType),
    StructField("decoded", BooleanType)))

  /** Per-partition audio decode over a `pack`ed frame (same mapInPandas
    * shape as decodeImages); undecodable payloads → decoded=false row.
    * `rms` is truncated to 6 decimals for cross-engine determinism.
    */
  def decodeAudio(packed: DataFrame, idCol: String): DataFrame = {
    val input = packed.select(col(idCol).cast(LongType),
      col("media_meta.format"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(r.getAs[Array[Byte]](2)) match {
          case Some(a) =>
            Row(r.getLong(0), r.getString(1), a.sampleRate, a.channels,
              a.samples.length, Wav.durationMs(a),
              math.floor(Wav.rms(a) * 1000000) / 1000000, Wav.peak(a),
              true)
          case None =>
            Row(r.getLong(0), r.getString(1), null, null, null, null,
              null, null, false)
        }
      }
    }(RowEncoder.encoderFor(audioSchema))
  }

  /** Video-analog frame sampling: the payload is a sequence of
    * FIXED-SIZE frames; keep every `everyNth` frame as its own row
    * (`frame_idx`, frame payload). Pure codegen'd expressions —
    * sequence + explode + binary substring, no UDF — so the row
    * explosion happens executor-side and each frame can flow into the
    * per-frame decoder (`decodeImages` on the exploded frame).
    */
  def frameSample(packed: DataFrame, idCol: String, frameBytes: Int,
      everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0)
    val nFrames = (octet_length(col("payload")) / frameBytes).cast(IntegerType)
    packed
      .withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0), nFrames - 1, lit(everyNth)))
          .otherwise(array().cast("array<int>"))))
      .withColumn("payload",
        col("payload").substr(col("frame_idx") * frameBytes + lit(1),
          lit(frameBytes)))
      .select(col(idCol), col("frame_idx"), col("payload"),
        col("media_meta"))
  }

  /** Perceptual image near-dup pairs (aHash): decode → 8×8 luma
    * thumbnail → 64-bit average hash (bit c set iff cell c's luma
    * STRICTLY exceeds the thumbnail mean) → banded Hamming pairs at
    * `maxDist` — the image analog of `Dedup.simhashPairs`, over 64 bits
    * (pigeonhole: maxDist+1 bands, any pair within maxDist agrees
    * exactly on one band; equi-join on the band, full-distance verify).
    * The decode rides the per-partition codec seam; everything after is
    * columnar. Undecodable payloads have no hash and pair with nothing.
    */
  def imageAHashPairs(packed: DataFrame, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"imageAHashPairs: maxDist must be in [0, 64), got $maxDist")
    // decodeImages' output schema names the id column doc_id regardless
    // of idCol — rename back to the caller's name
    val th = decodeImages(packed, idCol, thumbW = 8, thumbH = 8)
      .where(col("decoded"))
      .select(col("doc_id").as(idCol), col("thumb_luma"))
    banded64Pairs(
      th.select(col(idCol), aHash64(col("thumb_luma")).as("__h64")),
      idCol, maxDist)
  }

  /** Video near-dup pairs: sampled frames decode to 8×8 aHashes and
    * band-join ACROSS videos — two videos pair when at least
    * `minSharedFrames` DISTINCT sampled frames of the first have a near
    * (≤ maxDist) frame in the second. The composition of `frameSample`
    * with the image aHash banded search: no frame×frame product, no
    * video×video product — the join key is the band, and the per-pair
    * aggregation is a partial count. Frame indexes must stay below 1e6
    * (the per-frame key is id·1e6 + frame_idx).
    */
  def videoNearPairs(packed: DataFrame, idCol: String, frameBytes: Int,
      everyNth: Int, maxDist: Int, minSharedFrames: Int = 1): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"videoNearPairs: maxDist must be in [0, 64), got $maxDist")
    require(minSharedFrames >= 1,
      s"videoNearPairs: minSharedFrames must be >= 1")
    val frames = frameSample(packed, idCol, frameBytes, everyNth)
      .withColumn("__fkey",
        col(idCol).cast(LongType) * 1000000L + col("frame_idx"))
    val th = decodeImages(frames, "__fkey", thumbW = 8, thumbH = 8)
      .where(col("decoded"))
      .select(col("doc_id").as("__fkey"), col("thumb_luma"))
    val hashed = th.select(
      ((col("__fkey") - pmod(col("__fkey"), lit(1000000L))) / 1000000L)
        .cast(LongType).as("__vid"),
      pmod(col("__fkey"), lit(1000000L)).as("__fidx"),
      aHash64(col("thumb_luma")).as("__h64"))
    val banded = CacheLifecycle.pin(hashed.select(col("__vid"),
      col("__fidx"), col("__h64"),
      explode(bands64(col("__h64"), maxDist)).as("band")))
    val a = banded.select(col("band"), col("__vid").as("id_a"),
      col("__fidx").as("fa"), col("__h64").as("ha"))
    val b = banded.select(col("band"), col("__vid").as("id_b"),
      col("__h64").as("hb"))
    a.join(b, "band")
      .where(col("id_a") < col("id_b"))
      .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .select(col("id_a"), col("id_b"), col("fa")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minSharedFrames)
  }

  /** Banded Hamming pair search over a 64-bit signature column `__h64`
    * — pigeonhole: maxDist+1 bands, any pair within maxDist agrees
    * exactly on one band; equi-join on the band key, full-distance
    * verify. Shared by the image (aHash) and audio (envelope)
    * perceptual dedup ops; the 64-bit sibling of
    * `Dedup.simhashPairs`.
    */
  /** The maxDist+1 pigeonhole band keys of a 64-bit signature column. */
  private def bands64(h: Column, maxDist: Int): Column = {
    val nBands = maxDist + 1
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    array((0 until nBands).map { i =>
      val off = bounds(i)
      val width = bounds(i + 1) - bounds(i)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(i).as("bi"),
        call_function("shiftright", h, lit(off))
          .bitwiseAND(lit(mask)).as("bv"))
    }: _*)
  }

  /** The aHash over a decoded luma array: bit c set iff cell c STRICTLY
    * exceeds the array mean. 64 direct element accesses (no per-bit HOF
    * pass); adding distinct powers of two never carries, so the sum IS
    * the bit-OR — exact even with the sign bit.
    */
  private def aHash64(lum: Column): Column = {
    val mean = aggregate(lum, lit(0L), (a, x) => a + x)
      .cast(DoubleType) / size(lum)
    (0 until 64).map(c =>
      when(get(lum, lit(c)).cast(DoubleType) > mean, lit(1L << c))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  private[ml] def banded64Pairs(hashed: DataFrame, idCol: String,
      maxDist: Int): DataFrame = {
    val banded = CacheLifecycle.pin(
      hashed.select(col(idCol), col("__h64"),
        explode(bands64(col("__h64"), maxDist)).as("band")))
    val a = banded.select(col("band"), col(idCol).as("id_a"),
      col("__h64").as("ha"))
    val b = banded.select(col("band"), col(idCol).as("id_b"),
      col("__h64").as("hb"))
    a.join(b, "band")
      .where(col("id_a") < col("id_b"))
      .withColumn("dist",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast(IntegerType))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .distinct()
  }

  /** (id, 64-bit aHash) signatures of the decodable images of `packed`
    * — the shared currency of the persisted signature-index family
    * (build / append / probe all speak `(__sig_id, __h64)`).
    */
  private def imageSigs(packed: DataFrame, idCol: String): DataFrame =
    decodeImages(packed, idCol, thumbW = 8, thumbH = 8)
      .where(col("decoded"))
      .select(col("doc_id").as("__sig_id"),
        aHash64(col("thumb_luma")).as("__h64"))

  /** Persist a `(__ref_id, __h64)` signature frame as a probe-able
    * index directory. The index stores raw 64-bit signatures, not
    * exploded band keys: banding is maxDist+1 shift-mask ops derived
    * at probe time, so ONE index serves any probe `maxDist` (unlike
    * the MinHash index, whose band layout is baked in at build time
    * and therefore pinned by meta).
    */
  private def writeSigIndex(sigs: DataFrame, dir: String): Unit =
    sigs.select(col("__sig_id").as("__ref_id"), col("__h64"))
      .write.mode("overwrite").parquet(s"$dir/sigs")

  /** Append a batch's signatures to a signature-index directory,
    * skipping ids already present (first write wins; append never
    * rewrites or duplicates). Same probe direction as the dedup
    * itself: the INDEX streams, the batch's id set broadcasts — the
    * index is never shuffled.
    */
  private def appendSigIndex(spark: SparkSession, dir: String,
      newSigs: DataFrame): Unit = {
    val sigs = spark.read.parquet(s"$dir/sigs")
    val batch = newSigs.select(col("__sig_id").as("__ref_id"),
      col("__h64"))
    val existing = sigs
      .join(broadcast(batch.select("__ref_id").distinct()),
        Seq("__ref_id"), "left_semi")
      .select("__ref_id").distinct()
    batch.join(broadcast(existing), Seq("__ref_id"), "left_anti")
      .write.mode("append").parquet(s"$dir/sigs")
  }

  /** Rows of `newPacked` whose signature (in `newSigs`) is NOT within
    * Hamming `maxDist` of any signature in the index directory. Both
    * sides band with the pigeonhole layout for `maxDist` (any pair
    * within maxDist agrees exactly on one band), the INDEX side
    * streams against the BROADCAST batch bands — probing a
    * billion-row index costs one index scan and zero exchanges of it
    * — and candidates verify by full 64-bit distance.
    */
  private def dedupAgainstSigIndex(spark: SparkSession, dir: String,
      newPacked: DataFrame, newSigs: DataFrame, idCol: String,
      maxDist: Int): DataFrame = {
    val sigs = spark.read.parquet(s"$dir/sigs")
    val nb = newSigs
      .select(col("__sig_id").as("__new_id"), col("__h64").as("__nh"))
      .select(col("__new_id"), col("__nh"),
        explode(bands64(col("__nh"), maxDist)).as("band"))
    val rb = sigs.select(col("__ref_id"), col("__h64"),
      explode(bands64(col("__h64"), maxDist)).as("band"))
    val dropIds = rb.join(broadcast(nb), "band")
      .where(bit_count(col("__h64").bitwiseXOR(col("__nh"))) <= maxDist)
      .select(col("__new_id").as(idCol)).distinct()
    newPacked.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Persist the 64-bit aHash signatures of an image corpus — the
    * perceptual mirror of [[Dedup.buildBandIndex]] for the
    * crawl-incremental shape: new image batches dedup against a prior
    * corpus's STORED signatures (`dedupImagesAgainstAHashIndex`)
    * instead of re-decoding it per batch — decode + thumbnail is the
    * expensive pass, and it runs exactly once per corpus here. Rows
    * whose payload fails to decode hash to nothing and are not
    * indexed.
    */
  def buildAHashIndex(packed: DataFrame, idCol: String,
      dir: String): Unit =
    writeSigIndex(imageSigs(packed, idCol), dir)

  /** Fold admitted batch images into a `buildAHashIndex` directory —
    * the loop-closing step of the standing pipeline (probe, keep the
    * survivors, APPEND the survivors' signatures so the next batch
    * dedups against them). Ids already indexed are skipped (first
    * write wins), found with the same streaming-index/broadcast-batch
    * probe shape; undecodable batch rows hash to nothing and are
    * never indexed.
    */
  def updateAHashIndex(spark: SparkSession, dir: String,
      newPacked: DataFrame, idCol: String): Unit =
    appendSigIndex(spark, dir, imageSigs(newPacked, idCol))

  /** Rows of `newPacked` whose image is NOT a perceptual near-dup
    * (aHash Hamming distance ≤ `maxDist`) of any image in a
    * `buildAHashIndex` directory. Batch rows that fail to decode are
    * KEPT (no signature → no evidence of duplication); batch-internal
    * near-dups are not this operator's job — run `imageAHashPairs`
    * within the batch.
    */
  def dedupImagesAgainstAHashIndex(spark: SparkSession, dir: String,
      newPacked: DataFrame, idCol: String, maxDist: Int = 6): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"dedupImagesAgainstAHashIndex: maxDist must be in [0, 64), " +
        s"got $maxDist")
    dedupAgainstSigIndex(spark, dir, newPacked,
      imageSigs(newPacked, idCol), idCol, maxDist)
  }

  private val envelopeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("env", ArrayType(LongType)),
    StructField("decoded", BooleanType)))

  /** Per-window energy envelope of decoded PCM: `windows` equal sample
    * ranges (sample i lands in window i*windows/n), each summing
    * |sample| — exact integer arithmetic, so an external SQL replay
    * agrees bit-for-bit. Undecodable payloads → decoded=false.
    */
  def decodeAudioEnvelope(packed: DataFrame, idCol: String,
      windows: Int = 64): DataFrame = {
    require(windows > 0)
    val input = packed.select(col(idCol).cast(LongType), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        Wav.decode(r.getAs[Array[Byte]](1)) match {
          case Some(a) if a.samples.nonEmpty =>
            val n = a.samples.length
            val env = Array.fill(windows)(0L)
            var i = 0
            while (i < n) {
              env((i.toLong * windows / n).toInt) +=
                math.abs(a.samples(i).toLong)
              i += 1
            }
            Row(r.getLong(0), env.toSeq, true)
          case Some(_) => Row(r.getLong(0), Seq.fill(windows)(0L), true)
          case None    => Row(r.getLong(0), null, false)
        }
      }
    }(RowEncoder.encoderFor(envelopeSchema))
  }

  /** Audio perceptual near-dup pairs (energy-envelope hash): decode PCM
    * → 64 window energies → 64-bit hash (bit w set iff window w's
    * energy share STRICTLY exceeds the mean: env[w]·64 > total — an
    * integer comparison, no division) → banded Hamming pairs. The audio
    * member of the perceptual family next to `imageAHashPairs` (images)
    * and `Dedup.simhashPairs` (text).
    */
  def audioEnvelopePairs(packed: DataFrame, idCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"audioEnvelopePairs: maxDist must be in [0, 64), got $maxDist")
    banded64Pairs(audioSigs(packed, idCol)
      .select(col("__sig_id").as(idCol), col("__h64")), idCol, maxDist)
  }

  /** (id, 64-bit envelope hash) signatures of the decodable audio rows
    * of `packed` — the `audioEnvelopePairs` hash (bit w set iff window
    * w's energy share STRICTLY exceeds the mean: env[w]·64 > total, an
    * integer comparison).
    */
  private def audioSigs(packed: DataFrame, idCol: String): DataFrame = {
    val env = decodeAudioEnvelope(packed, idCol, windows = 64)
      .where(col("decoded"))
      .select(col("doc_id").as("__sig_id"), col("env"))
      .withColumn("__tot", aggregate(col("env"), lit(0L), (a, x) => a + x))
    val ahash = (0 until 64).map(w =>
      when(get(col("env"), lit(w)) * 64 > col("__tot"), lit(1L << w))
        .otherwise(lit(0L))).reduce(_ + _)
    env.select(col("__sig_id"), ahash.as("__h64"))
  }

  /** Persist the 64-bit envelope-hash signatures of an audio corpus —
    * the audio member of the persisted signature-index family next to
    * [[buildAHashIndex]] (images): new audio batches dedup against a
    * prior corpus's STORED signatures instead of re-decoding its PCM
    * per batch. Undecodable payloads are not indexed.
    */
  def buildAudioIndex(packed: DataFrame, idCol: String,
      dir: String): Unit =
    writeSigIndex(audioSigs(packed, idCol), dir)

  /** Fold admitted batch audio into a `buildAudioIndex` directory —
    * probe, keep the survivors, APPEND the survivors' signatures so
    * the next batch dedups against them. Ids already indexed are
    * skipped (first write wins); undecodable batch rows never index.
    */
  def updateAudioIndex(spark: SparkSession, dir: String,
      newPacked: DataFrame, idCol: String): Unit =
    appendSigIndex(spark, dir, audioSigs(newPacked, idCol))

  /** Rows of `newPacked` whose audio is NOT a perceptual near-dup
    * (envelope-hash Hamming distance ≤ `maxDist`) of any clip in a
    * `buildAudioIndex` directory. Batch rows that fail to decode are
    * KEPT; batch-internal near-dups are `audioEnvelopePairs`' job.
    */
  def dedupAudioAgainstIndex(spark: SparkSession, dir: String,
      newPacked: DataFrame, idCol: String, maxDist: Int = 6): DataFrame = {
    require(maxDist >= 0 && maxDist < 64,
      s"dedupAudioAgainstIndex: maxDist must be in [0, 64), got $maxDist")
    dedupAgainstSigIndex(spark, dir, newPacked,
      audioSigs(newPacked, idCol), idCol, maxDist)
  }

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

  /** Cross-modal consistency filter over a provided pair table — the
    * CLIP-score curation step for caption↔image training pairs (drop
    * pairs whose text and image embeddings disagree; Schuhmann et al.,
    * LAION, used cosine < 0.28 as the discard rule). Each side is
    * L2-normalized ONCE (linear pass), then the pair table drives two
    * narrow equi-joins — shuffle on the id keys, never a product — and
    * the score is one codegen'd dot product per pair. Output is
    * pair-scale: (textKey, imageKey, clip_score, keep), keep =
    * score ≥ threshold, score kept for audit/threshold sweeps. Pairs
    * whose text or image id has no embedding row cannot be scored and
    * are dropped by the inner joins — at curation time an unembedded
    * pair is unusable either way.
    *
    * At 100 TB both embedding sides are corpus-scale and the pair table
    * is corpus-scale too, so nothing here may broadcast or window: the
    * plan is exactly two shuffled hash joins keyed by id plus a map.
    */
  def consistencyFilter(pairs: DataFrame, textEmb: DataFrame,
      imageEmb: DataFrame, embCol: String, idCol: String,
      textKey: String, imageKey: String,
      threshold: Double): DataFrame = {
    val t = Fns.normalized(textEmb, embCol, idCol, "__vt")
      .withColumnRenamed(idCol, "__tid")
    val i = Fns.normalized(imageEmb, embCol, idCol, "__vi")
      .withColumnRenamed(idCol, "__iid")
    pairs.join(t, col(textKey) === col("__tid"))
      .join(i, col(imageKey) === col("__iid"))
      .withColumn("clip_score", Fns.ndot6(col("__vt"), col("__vi")))
      .withColumn("keep", col("clip_score") >= threshold)
      .drop("__vt", "__vi", "__tid", "__iid")
  }
}
