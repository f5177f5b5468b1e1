package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure-JVM codec — no Spark session, so
  * thousands of byte-level cases run in milliseconds. */
object MediaCodecPropertySpec extends Properties("MediaCodec") {

  private val dimsGen = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
  } yield (w, h)

  property("BMP encode → pixelsRgb round-trips any pixel grid (incl. row padding)") =
    Prop.forAll(dimsGen, Gen.long) { case ((w, h), seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val enc = MediaCodec.encodeBmp24(w, h, rgb)
      MediaCodec.pixelsRgb(enc).exists { case (dw, dh, back) =>
        dw == w && dh == h && java.util.Arrays.equals(back, rgb)
      } && MediaCodec.imageDims(enc).contains(MediaCodec.ImageDims(w, h, 3, "bmp"))
    }

  property("mean-pool features are unit-norm and deterministic") =
    Prop.forAll(dimsGen, Gen.long) { case ((w, h), seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val enc = MediaCodec.encodeBmp24(w, h, rgb)
      val a = MediaCodec.meanPoolFeatures(enc).get
      val b = MediaCodec.meanPoolFeatures(enc).get
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      a.sameElements(b) && math.abs(norm - 1.0) < 1e-4
    }

  property("wavInfo duration math holds for arbitrary PCM shapes") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(1000, 192000), Gen.oneOf(8, 16, 24, 32),
      Gen.choose(0, 100000)) { (ch, rate, bits, n) =>
      val dataBytes = n * ch * (bits / 8)
      val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(ch.toShort)
      b.putInt(rate).putInt(rate * ch * bits / 8)
      b.putShort((ch * bits / 8).toShort).putShort(bits.toShort)
      b.put("data".getBytes).putInt(dataBytes)
      MediaCodec.wavInfo(b.array()).contains(
        MediaCodec.WavInfo(ch, rate, bits, n.toLong * 1000L / rate, n.toLong))
    }

  property("foreign bytes never decode and never throw") =
    Prop.forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val b = bytes.toArray
      // filter out byte strings that legitimately start with a known magic
      val magic = b.length >= 2 &&
        ((b(0) == 'B' && b(1) == 'M') || (b(0) == 'P' && b(1) == '6') ||
         (b(0) == 'G' && b(1) == 'I') || ((b(0) & 0xFF) == 0x89) ||
         ((b(0) & 0xFF) == 0xFF) || (b(0) == 'R'))
      magic || (MediaCodec.imageDims(b).isEmpty && MediaCodec.pixelsRgb(b).isEmpty &&
        MediaCodec.wavInfo(b).isEmpty)
    }
}
