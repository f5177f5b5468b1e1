package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * ride as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as batched partition-local
  * transforms (the Scala analog of `mapInPandas` — an iterator of fixed-size
  * batches per partition, so a real decoder amortizes model/codec setup per
  * batch, not per row).
  *
  * Byte decoding is REAL for the formats that need no codec library
  * ([[MediaCodec]]: BMP/PNG/GIF/JPEG/PPM header dims, uncompressed
  * BMP24/PPM6 pixel decode + mean-pool features, PCM WAV info); payloads
  * in compressed codec formats fall back to [[DecoderStub]]'s
  * deterministic pseudo-decodes (no codec artifacts offline). Every
  * Spark-side piece — schema contract, batch shape, partitioning, null
  * handling — is identical on both paths; a production deployment swaps
  * the stub branch for e.g. JavaCV and nothing else moves.
  */
object Multimodal {

  /** Metadata struct carried alongside the binary payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", MediaMetaType)))

  // =============================================================== STUB ===
  /** Deterministic stand-in for real codecs. A production deployment
    * replaces these three functions with e.g. JavaCV / TwelveMonkeys
    * decodes; signatures and batch shape stay identical. */
  object DecoderStub {
    /** "Decode" → (width, height, channels) inferred from bytes. */
    def imageDims(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1, 3)
    }

    /** "Feature-extract" → deterministic dim-length float vector. */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(j) = ((h & 0xFFFFFF).toFloat / 0x7FFFFF) - 1.0f
        j += 1
      }
      out
    }

    /** "Frame-sample" → frame indexes at a stride over the duration. */
    def frameIndexes(durationMs: Long, fps: Double, maxFrames: Int): Seq[Long] = {
      val stepMs = (1000.0 / fps).toLong.max(1L)
      (0L until durationMs by stepMs).take(maxFrames)
    }
  }
  // ========================================================================

  private val DefaultBatchSize = 64

  /** Batched partition-local transform: groups each partition's rows into
    * fixed-size batches and flat-maps a batch function — the mapInPandas
    * execution shape. Output schema is explicit (dynamic frames, no case
    * classes needed). */
  def mapInBatches(df: DataFrame, outputSchema: StructType,
                   batchSize: Int = DefaultBatchSize)
                  (fn: Seq[Row] => Iterator[Row]): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outputSchema)
    df.mapPartitions { it => it.grouped(batchSize).flatMap(fn) }(enc).toDF()
  }

  /** Decode pass: payload → decoded dimensions appended as columns.
    * Null payloads yield null dims (kept, not dropped — error policy is the
    * caller's via DynFrame thresholds). */
  def decodeImages(df: DataFrame, payloadCol: String = "payload",
                   batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("dec_width", IntegerType), StructField("dec_height", IntegerType),
      StructField("dec_channels", IntegerType)))
    val idx = df.schema.fieldIndex(payloadCol)
    mapInBatches(df, outSchema, batchSize) { batch =>
      // per-batch setup happens HERE in a real decoder (codec init, model load)
      batch.iterator.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        if (payload == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else MediaCodec.imageDims(payload) match {
          case Some(d) => Row.fromSeq(r.toSeq ++ Seq(d.width, d.height, d.channels))
          case None => // unrecognized/compressed format: deterministic stub
            val (w, h, c) = DecoderStub.imageDims(payload)
            Row.fromSeq(r.toSeq ++ Seq(w, h, c))
        }
      }
    }
  }

  /** Audio decode pass (PCM WAV via [[MediaCodec.wavInfo]]): appends
    * audio_channels / sample_rate / bits / audio_ms columns; non-WAV or
    * malformed payloads yield nulls. */
  def decodeAudio(df: DataFrame, payloadCol: String = "payload",
                  batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("audio_channels", IntegerType), StructField("sample_rate", IntegerType),
      StructField("bits_per_sample", IntegerType), StructField("audio_ms", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    mapInBatches(df, outSchema, batchSize) { batch =>
      batch.iterator.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        MediaCodec.wavInfo(payload) match {
          // Seq[Any]: a plain Seq would numerically widen the Ints to Long
          case Some(w) => Row.fromSeq(r.toSeq ++
            Seq[Any](w.channels, w.sampleRate, w.bitsPerSample, w.durationMs))
          case None    => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }
  }

  /** Feature-extraction pass: payload → `array<float>` embedding column,
    * ready for [[graft.ann.Ann]] similarity search. */
  def extractFeatures(df: DataFrame, dim: Int, payloadCol: String = "payload",
                      outputCol: String = "embedding",
                      batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(payloadCol)
    // real mean-pool features for decodable pixels, sized to `dim`
    val grid = math.max(1, math.ceil(math.sqrt(math.max(dim - 3, 1))).toInt)
    mapInBatches(df, outSchema, batchSize) { batch =>
      batch.iterator.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        val feats =
          if (payload == null) null
          else MediaCodec.meanPoolFeatures(payload, grid) match {
            case Some(f) => java.util.Arrays.copyOf(f, dim).toSeq // truncate/zero-pad to dim
            case None    => DecoderStub.features(payload, dim).toSeq
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** Resize is metadata-only in the stub: rewrites the meta struct to the
    * target box, preserving aspect ratio (the real version also transforms
    * payload bytes). Pure column expressions — no shuffle, codegen'd. */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int, metaCol: String = "meta"): DataFrame = {
    val w = col(s"$metaCol.width").cast("double")
    val h = col(s"$metaCol.height").cast("double")
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.withColumn(metaCol, struct(
      col(s"$metaCol.format").as("format"),
      round(w * scale).cast("int").as("width"),
      round(h * scale).cast("int").as("height"),
      col(s"$metaCol.duration_ms").as("duration_ms")))
  }

  /** Frame sampling for video payloads: one output row per sampled frame
    * index (posexplode over the stub's frame plan). */
  def sampleFrames(df: DataFrame, fps: Double, maxFrames: Int,
                   metaCol: String = "meta"): DataFrame = {
    val stepMs = greatest(lit((1000.0 / fps).toLong), lit(1L))
    val frames = slice(
      sequence(lit(0L), greatest(col(s"$metaCol.duration_ms") - 1, lit(0L)), stepMs),
      1, maxFrames)
    df.withColumn("frame_ms", explode(frames))
  }
}
