package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, Array[Byte](1, 2, 3, 4), Row("jpeg", 4000, 3000, null)),
      Row(2L, Array[Byte](9, 9), Row("png", 800, 600, null)),
      Row(3L, null, Row("jpeg", 10, 10, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      Multimodal.MediaSchema.copy()) // media_id, payload, meta
  }

  test("decodeImages appends dims; null payload yields null dims") {
    val out = Multimodal.decodeImages(mediaDf)
    assert(out.columns.takeRight(3).toSeq == Seq("dec_width", "dec_height", "dec_channels"))
    val byId = out.select("media_id", "dec_width").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1L).isDefined && byId(3L).isEmpty)
    // deterministic: same payload, same decode
    val out2 = Multimodal.decodeImages(mediaDf)
    assert(out.orderBy("media_id").collect().toSeq == out2.orderBy("media_id").collect().toSeq)
  }

  test("extractFeatures produces fixed-dim float vectors ready for ANN") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 16)
    val vecs = out.filter(col("payload").isNotNull)
      .select("embedding").as[Seq[Float]].collect()
    assert(vecs.forall(_.length == 16))
    assert(vecs.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    // distinct payloads -> distinct embeddings
    assert(vecs.toSet.size == 2)
  }

  // ---------------------------------------------- real-codec fixtures ----

  /** Minimal 24-bit bottom-up BMP with the given RGB pixel grid. */
  private def bmp24(px: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        val (r, g, bl) = px(y)(x)
        b.put(bl.toByte).put(g.toByte).put(r.toByte) // BGR
      }
      b.position(b.position() + rowBytes - w * 3)
    }
    b.array()
  }

  private def ppm6(px: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    for (row <- px; (r, g, b) <- row) { out.write(r); out.write(g); out.write(b) }
    out.toByteArray
  }

  private def wavPcm(channels: Int, rate: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * channels * (bits / 8)
    val b = java.nio.ByteBuffer.allocate(44 + dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
    b.putInt(rate).putInt(rate * channels * bits / 8)
    b.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    b.put("data".getBytes).putInt(dataBytes)
    b.array()
  }

  test("MediaCodec decodes real headers: BMP, PPM, PNG, GIF, JPEG") {
    val red = Array.fill(2, 2)((255, 0, 0))
    assert(MediaCodec.imageDims(bmp24(red)).contains(MediaCodec.ImageDims(2, 2, 3, "bmp")))
    assert(MediaCodec.imageDims(ppm6(red)).contains(MediaCodec.ImageDims(2, 2, 3, "ppm")))
    val png = java.nio.ByteBuffer.allocate(26)
      .put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
      .put(8.toByte).put(6.toByte).array() // bit depth 8, color type 6 = rgba
    assert(MediaCodec.imageDims(png).contains(MediaCodec.ImageDims(640, 480, 4, "png")))
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xF0.toByte, 0x00) // 320x240 LE
    assert(MediaCodec.imageDims(gif).contains(MediaCodec.ImageDims(320, 240, 3, "gif")))
    val jpeg = java.nio.ByteBuffer.allocate(32)
      .put(Array[Byte](0xFF.toByte, 0xD8.toByte))                    // SOI
      .put(Array[Byte](0xFF.toByte, 0xE0.toByte, 0x00, 0x04, 0, 0)) // APP0 len 4
      .put(Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x0B))       // SOF0 len 11
      .put(8.toByte).putShort(600.toShort).putShort(800.toShort).put(3.toByte)
      .array()
    assert(MediaCodec.imageDims(jpeg).contains(MediaCodec.ImageDims(800, 600, 3, "jpeg")))
    assert(MediaCodec.imageDims("not an image at all".getBytes).isEmpty)
  }

  test("MediaCodec pixel decode: BMP and PPM agree on the same image") {
    val px = Array(Array((255, 0, 0), (0, 255, 0)), Array((0, 0, 255), (10, 20, 30)))
    val Some((wb, hb, fromBmp)) = MediaCodec.pixelsRgb(bmp24(px))
    val Some((wp, hp, fromPpm)) = MediaCodec.pixelsRgb(ppm6(px))
    assert((wb, hb) == (2, 2) && (wp, hp) == (2, 2))
    assert(fromBmp.toSeq == fromPpm.toSeq, "BMP (bottom-up BGR) and PPM disagree")
    assert((fromBmp(0) & 0xFF, fromBmp(1) & 0xFF, fromBmp(2) & 0xFF) == (255, 0, 0))
    // the encoder round-trips through the decoder (incl. 3-wide row padding)
    val enc = MediaCodec.encodeBmp24(3, 2, Array.tabulate(18)(i => (i * 7).toByte))
    val Some((we, he, back)) = MediaCodec.pixelsRgb(enc)
    assert((we, he) == (3, 2) && back.toSeq == Array.tabulate(18)(i => (i * 7).toByte).toSeq)
  }

  test("real mean-pool features are scale-invariant for solid colors") {
    // images must cover the 4x4 pooling grid for invariance to hold
    val small = bmp24(Array.fill(4, 4)((200, 40, 40)))
    val large = ppm6(Array.fill(8, 8)((200, 40, 40)))
    val (a, b) = (MediaCodec.meanPoolFeatures(small).get, MediaCodec.meanPoolFeatures(large).get)
    assert(a.length == 19 && b.length == 19)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5) }
  }

  test("MediaCodec wavInfo parses PCM WAV duration") {
    val w = MediaCodec.wavInfo(wavPcm(channels = 2, rate = 16000, bits = 16, nSamples = 8000))
    assert(w.contains(MediaCodec.WavInfo(2, 16000, 16, 500L, 8000L)))
    assert(MediaCodec.wavInfo("RIFFjunk".getBytes).isEmpty)
  }

  test("corrupt headers return None — never hang or throw") {
    // WAV with a chunk size of 0xFFFFFFF8: naive int math would step the
    // cursor by <= 0 and spin forever
    val evil = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    evil.put("LIST".getBytes).putInt(0xFFFFFFF8)
    assert(MediaCodec.wavInfo(evil.array()).isEmpty)
    // BMP with a hostile negative pixel-data offset / absurd dims
    val bmp = bmp24(Array.fill(2, 2)((1, 2, 3)))
    val negOff = bmp.clone(); negOff(10) = 0; negOff(11) = 0; negOff(12) = 0; negOff(13) = 0x80.toByte
    assert(MediaCodec.pixelsRgb(negOff).isEmpty)
    val hugeW = bmp.clone(); hugeW(18) = 0; hugeW(19) = 0; hugeW(20) = 0; hugeW(21) = 0x60
    assert(MediaCodec.pixelsRgb(hugeW).isEmpty && MediaCodec.imageDims(hugeW).isEmpty)
    // PPM declaring zero dims is invalid in header AND pixel decode
    assert(MediaCodec.imageDims("P6\n0 0\n255\n".getBytes).isEmpty)
    // 16-bit P6 (maxval > 255) is 2 bytes/sample — not the layout decoded
    // here; must be None, not garbage pixels. maxval=0 is malformed too.
    val deep16 = ("P6\n2 2\n65535\n" + "x" * 24).getBytes("US-ASCII")
    assert(MediaCodec.pixelsRgb(deep16).isEmpty && MediaCodec.imageDims(deep16).isEmpty)
    val zeroMax = ("P6\n2 2\n0\n" + "x" * 12).getBytes("US-ASCII")
    assert(MediaCodec.pixelsRgb(zeroMax).isEmpty && MediaCodec.imageDims(zeroMax).isEmpty)
  }

  test("PNG channel count follows the IHDR color type") {
    def png(colorType: Int) = java.nio.ByteBuffer.allocate(26)
      .put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put("IHDR".getBytes).putInt(10).putInt(10)
      .put(8.toByte).put(colorType.toByte).array()
    assert(MediaCodec.imageDims(png(0)).get.channels == 1) // gray
    assert(MediaCodec.imageDims(png(2)).get.channels == 3) // rgb
    assert(MediaCodec.imageDims(png(6)).get.channels == 4) // rgba
  }

  test("decodeImages uses real dims for decodable payloads; decodeAudio real WAV info") {
    val rows = Seq(
      Row(1L, bmp24(Array.fill(3, 5)((1, 2, 3))), Row("bmp", 0, 0, null)),
      Row(2L, Array[Byte](1, 2, 3), Row("bin", 0, 0, null)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Multimodal.MediaSchema)
    val out = Multimodal.decodeImages(df).select("media_id", "dec_width", "dec_height")
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(out(1L) == ((5, 3)), s"real BMP dims expected, got ${out(1L)}")
    assert(out(2L)._1 != null) // stub fallback still decodes deterministically
    val audioRows = Seq(
      Row(10L, wavPcm(1, 8000, 16, 4000), Row("wav", 0, 0, null)),
      Row(11L, Array[Byte](9, 9, 9), Row("bin", 0, 0, null)))
    val adf = spark.createDataFrame(spark.sparkContext.parallelize(audioRows, 1), Multimodal.MediaSchema)
    val aout = Multimodal.decodeAudio(adf).select("media_id", "sample_rate", "audio_ms")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(aout(10L) == ((Some(8000), Some(500L))))
    assert(aout(11L) == ((None, None)))
  }

  test("mapInBatches delivers fixed-size batches per partition") {
    val df = spark.range(0, 100, 1, 2).toDF("id")
    // emit one row per batch carrying its size (closures run on executors,
    // so sizes must travel through the data)
    val out = Multimodal.mapInBatches(df,
      StructType(Seq(StructField("n", IntegerType))), batchSize = 16) { batch =>
      Iterator.single(Row(batch.size))
    }
    val observed = out.as[Int].collect().toSeq
    assert(observed.sum == 100)
    assert(observed.max <= 16)
    assert(observed.count(_ == 16) == 6) // two partitions of 50 -> 3 full batches each
  }

  test("resizeMeta preserves aspect ratio within the target box") {
    val out = Multimodal.resizeMeta(mediaDf, 1000, 1000)
    val dims = out.select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(dims(1L) == (1000, 750))  // 4000x3000 scaled by 1/4
    assert(dims(2L) == (800, 600))   // already inside the box: untouched
  }

  test("sampleFrames explodes one row per sampled frame index") {
    val vid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null, Row("mp4", 1920, 1080, 2000L)))),
      Multimodal.MediaSchema)
    val out = Multimodal.sampleFrames(vid, fps = 2.0, maxFrames = 3)
    // 2 fps over 2000ms -> 0, 500, 1000, 1500 capped at 3 frames
    assert(out.select("frame_ms").as[Long].collect().toSeq == Seq(0L, 500L, 1000L))
  }
}
