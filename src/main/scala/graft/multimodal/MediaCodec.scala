package graft.multimodal

/** Real (pure-JVM, dependency-free) media decoding for the formats that
  * don't need a codec library:
  *
  *  - dimensions from headers: BMP, PNG (IHDR), GIF, JPEG (SOF scan),
  *    binary PPM (P6);
  *  - full pixel decode: uncompressed 24-bit BMP and P6 PPM;
  *  - WAV (PCM RIFF): channels / sample rate / bit depth / duration.
  *
  * Compressed pixel data (JPEG entropy coding, PNG zlib+filters, audio
  * codecs) stays behind [[Multimodal.DecoderStub]] — this object is the
  * line between "real and testable offline" and "needs a codec artifact".
  * All parsers return None on malformed/foreign bytes instead of throwing
  * (decode errors are data, not exceptions, in a pipeline).
  */
object MediaCodec {

  final case class ImageDims(width: Int, height: Int, channels: Int, format: String)
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                           durationMs: Long, nSamples: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** Image dimensions + channel count from the header alone. */
  def imageDims(b: Array[Byte]): Option[ImageDims] = {
    if (b == null || b.length < 10) None
    // BMP: "BM", BITMAPINFOHEADER width/height at 18/22 (LE), bpp at 28
    else if (b(0) == 'B' && b(1) == 'M' && b.length >= 30) {
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22)) // negative height = top-down rows
      val bpp = le16(b, 28)
      val maxDim = 1 << 16 // same sanity bound as pixelsRgb
      if (w > 0 && h > 0 && w <= maxDim && h <= maxDim && bpp > 0)
        Some(ImageDims(w, h, math.max(bpp / 8, 1), "bmp"))
      else None
    }
    // PNG: 8-byte signature, IHDR starts at 16 (width/height BE; color
    // type at 25 gives the channel count)
    else if (b.length >= 26 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      val w = be32(b, 16); val h = be32(b, 20)
      val channels = u8(b, 25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // rgb
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case _ => 4 // rgba
      }
      if (w > 0 && h > 0) Some(ImageDims(w, h, channels, "png")) else None
    }
    // GIF87a/89a: logical screen size at 6/8 (LE)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) Some(ImageDims(w, h, 3, "gif")) else None
    }
    // JPEG: scan marker segments for a SOFn (0xC0-0xCF except DHT/DAC/RST)
    else if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) {
      var i = 2
      while (i + 9 < b.length && u8(b, i) == 0xFF) {
        val marker = u8(b, i + 1)
        if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          val h = be16(b, i + 5); val w = be16(b, i + 7); val c = u8(b, i + 9)
          return if (w > 0 && h > 0) Some(ImageDims(w, h, c, "jpeg")) else None
        }
        i += 2 + be16(b, i + 2) // segment length includes its own 2 bytes
      }
      None
    }
    // binary PPM: "P6" whitespace w h maxval
    else if (b(0) == 'P' && b(1) == '6') ppmHeader(b).collect {
      // same maxval bound as pixelsRgb: only 1-byte-per-sample P6 is known
      case (w, h, maxval, _) if w > 0 && h > 0 && maxval > 0 && maxval <= 255 =>
        ImageDims(w, h, 3, "ppm")
    }
    else None
  }

  /** (width, height, maxval, pixel-data offset) of a P6 PPM. */
  private def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1
      if (i < b.length && b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
      else {
        var x = 0; var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { x = x * 10 + (b(i) - '0'); i += 1; any = true }
        if (!any) return None
        vals(v) = x; v += 1
      }
    }
    if (i >= b.length) None else Some((vals(0), vals(1), vals(2), i + 1))
  }

  /** Full pixel decode for the uncompressed formats: row-major RGB triples
    * (top-down). 24-bit BMP rows are stored bottom-up and 4-byte padded —
    * both undone here. */
  def pixelsRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 2) None
    else if (b(0) == 'B' && b(1) == 'M' && b.length >= 54 && le16(b, 28) == 24) {
      val w = le32(b, 18); val hRaw = le32(b, 22); val h = math.abs(hRaw)
      val off = le32(b, 10)
      // sane-range guards BEFORE any arithmetic: a hostile/corrupt header
      // must return None, never index negatively or overflow w*3
      val maxDim = 1 << 16
      if (w <= 0 || h <= 0 || w > maxDim || h > maxDim || off < 54 || off > b.length) None
      else {
        val rowBytes = (w * 3 + 3) / 4 * 4
        if (off.toLong + rowBytes.toLong * h > b.length) None
        else {
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val srcRow = off + (if (hRaw > 0) (h - 1 - y) else y) * rowBytes
            var x = 0
            while (x < w) {
              // BMP stores BGR
              out((y * w + x) * 3) = b(srcRow + x * 3 + 2)
              out((y * w + x) * 3 + 1) = b(srcRow + x * 3 + 1)
              out((y * w + x) * 3 + 2) = b(srcRow + x * 3)
              x += 1
            }
            y += 1
          }
          Some((w, h, out))
        }
      }
    } else if (b(0) == 'P' && b(1) == '6') {
      ppmHeader(b).flatMap { case (w, h, maxval, off) =>
        val maxDim = 1 << 16
        // maxval > 255 means 2 bytes/sample — not the 1-byte layout decoded
        // here; maxval == 0 is malformed. Both return None, not garbage.
        if (w <= 0 || h <= 0 || w > maxDim || h > maxDim ||
          maxval <= 0 || maxval > 255 ||
          off.toLong + w.toLong * h * 3 > b.length) None
        else Some((w, h, java.util.Arrays.copyOfRange(b, off, off + w * h * 3)))
      }
    } else None
  }

  /** Real image features for decodable payloads: per-channel means plus a
    * `grid×grid` gray mean-pool, L2-normalized — the classic cheap visual
    * descriptor (enough for exact-dup and near-dup detection of
    * re-encodes/resizes). Output length = 3 + grid². */
  def meanPoolFeatures(b: Array[Byte], grid: Int = 4): Option[Array[Float]] =
    pixelsRgb(b).map { case (w, h, px) =>
      val out = new Array[Float](3 + grid * grid)
      var i = 0
      while (i < w * h) {
        out(0) += (px(i * 3) & 0xFF); out(1) += (px(i * 3 + 1) & 0xFF); out(2) += (px(i * 3 + 2) & 0xFF)
        i += 1
      }
      var c = 0
      while (c < 3) { out(c) /= (w * h * 255.0f); c += 1 }
      val counts = new Array[Int](grid * grid)
      var y = 0
      while (y < h) {
        val gy = math.min(y * grid / h, grid - 1)
        var x = 0
        while (x < w) {
          val gx = math.min(x * grid / w, grid - 1)
          val p = (y * w + x) * 3
          val gray = ((px(p) & 0xFF) + (px(p + 1) & 0xFF) + (px(p + 2) & 0xFF)) / 3.0f
          out(3 + gy * grid + gx) += gray / 255.0f
          counts(gy * grid + gx) += 1
          x += 1
        }
        y += 1
      }
      var g = 0
      while (g < grid * grid) {
        if (counts(g) > 0) out(3 + g) /= counts(g)
        g += 1
      }
      var norm = 0.0
      var j = 0
      while (j < out.length) { norm += out(j) * out(j); j += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < out.length) { out(j) *= inv; j += 1 }
      }
      out
    }

  /** Encode row-major RGB triples as an uncompressed 24-bit BMP — the
    * inverse of [[pixelsRgb]] (which round-trips it): real binary media
    * for tests/synthetic corpora, and a legitimate sink encoding. */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length >= w * h * 3, "need w*h*3 rgb bytes")
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up rows
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        b.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** PCM WAV header + duration (RIFF/WAVE with fmt and data chunks). */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // Long cursor + explicit monotone advance: a corrupt 32-bit chunk size
    // (e.g. 0xFFFFFFF8) must not wrap to a negative/zero step — the walk
    // either terminates past the buffer or returns None, never spins/throws
    var i = 12L
    var channels = 0; var rate = 0; var bits = 0
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels == 0 || dataBytes < 0)) {
      val at = i.toInt
      val id = new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, at + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && i + 24 <= b.length) {
        channels = le16(b, at + 10); rate = le32(b, at + 12); bits = le16(b, at + 22)
      } else if (id == "data") dataBytes = size
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataBytes < 0) None
    else {
      val bytesPerSample = channels.toLong * (bits / 8)
      val n = if (bytesPerSample > 0) dataBytes / bytesPerSample else 0L
      Some(WavInfo(channels, rate, bits, n * 1000L / rate, n))
    }
  }
}
