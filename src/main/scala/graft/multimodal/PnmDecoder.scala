package graft.multimodal

/** Minimal pure-JVM binary-PNM codec — P5 (PGM, 8-bit grayscale) and
  * P6 (PPM, 8-bit RGB) — the second REAL format behind the
  * [[MediaDecoder]] seam, so the decoder REGISTRY (format dispatch) is
  * proven on genuinely different encodings rather than a single codec.
  * The format follows the public Netpbm layout: ASCII header
  * `P5|P6 <width> <height> <maxval>` with `#` comments and arbitrary
  * whitespace, one binary byte (P5) or RGB triple (P6) per pixel.
  * `decode(encode(px)) == px` exactly; only maxval = 255 is accepted
  * (multi-byte samples route to the stub fallback like any other
  * unknown payload).
  */
object PnmCodec {

  /** Dimension cap for header validation — same rationale as
    * BmpCodec.MaxDim: hostile headers must fail the sniff, not
    * overflow width*height arithmetic downstream. */
  private val MaxDim = 1 << 15

  private def header(magic: String, width: Int, height: Int): Array[Byte] =
    s"$magic\n$width $height\n255\n".getBytes("US-ASCII")

  /** Encode a top-down row-major grayscale array (0..255 ints) as P5. */
  def encodePgm(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"pixel array must be width*height: ${gray.length} vs ${width}x$height")
    val h = header("P5", width, height)
    val out = new Array[Byte](h.length + gray.length)
    System.arraycopy(h, 0, out, 0, h.length)
    var i = 0
    while (i < gray.length) { out(h.length + i) = (gray(i) & 0xff).toByte; i += 1 }
    out
  }

  /** Encode a top-down row-major RGB array (0xRRGGBB ints) as P6. */
  def encodePpm(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height,
      s"pixel array must be width*height: ${rgb.length} vs ${width}x$height")
    val h = header("P6", width, height)
    val out = new Array[Byte](h.length + rgb.length * 3)
    System.arraycopy(h, 0, out, 0, h.length)
    var i = 0
    while (i < rgb.length) {
      val p = rgb(i); val o = h.length + i * 3
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
      i += 1
    }
    out
  }

  /** Parsed header: (isColor, width, height, pixel-data offset), or None
    * when the payload is not a fully valid single-byte binary PNM.
    * All bound checks run in LONG space — a hostile header (huge dims,
    * truncated body, absurd comment run) must return None, never throw
    * or overflow. */
  private[multimodal] def parseHeader(bytes: Array[Byte]): Option[(Boolean, Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P'.toByte) return None
    val color = bytes(1) match {
      case '6' => true
      case '5' => false
      case _   => return None
    }
    // Three whitespace/comment-separated ASCII ints, then ONE
    // whitespace byte, then binary pixel data (the Netpbm contract).
    var i = 2
    val fields = new Array[Long](3)
    var f = 0
    while (f < 3) {
      // skip whitespace and '#'-to-end-of-line comments
      var skipping = true
      while (skipping) {
        if (i >= bytes.length) return None
        val c = bytes(i)
        if (c == '#'.toByte) {
          while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
        } else if (c == ' '.toByte || c == '\t'.toByte || c == '\n'.toByte ||
            c == '\r'.toByte || c == '\f'.toByte) i += 1
        else skipping = false
      }
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0'.toByte && bytes(i) <= '9'.toByte) {
        v = v * 10 + (bytes(i) - '0'.toByte)
        if (v > Int.MaxValue) return None
        any = true
        i += 1
      }
      if (!any) return None
      fields(f) = v
      f += 1
    }
    if (i >= bytes.length) return None
    val c = bytes(i)
    if (c != ' '.toByte && c != '\t'.toByte && c != '\n'.toByte &&
        c != '\r'.toByte && c != '\f'.toByte) return None
    i += 1
    val (w, h, maxval) = (fields(0), fields(1), fields(2))
    val bpp = if (color) 3L else 1L
    if (w < 1 || h < 1 || w > MaxDim || h > MaxDim || maxval != 255L) None
    else if (bytes.length.toLong < i.toLong + w * h * bpp) None
    else Some((color, w.toInt, h.toInt, i))
  }

  /** True when the payload is a fully validated single-byte binary PNM. */
  def isPnm(bytes: Array[Byte]): Boolean = parseHeader(bytes).isDefined

  /** Decode to (isColor, width, height, top-down row-major pixels —
    * 0xRRGGBB for P6, 0..255 gray for P5). */
  def decode(bytes: Array[Byte]): (Boolean, Int, Int, Array[Int]) = {
    val (color, w, h, off) = parseHeader(bytes)
      .getOrElse(throw new IllegalArgumentException("not a binary PGM/PPM payload"))
    val out = new Array[Int](w * h)
    var i = 0
    if (color) {
      while (i < out.length) {
        val o = off + i * 3
        out(i) = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
          (bytes(o + 2) & 0xff)
        i += 1
      }
    } else {
      while (i < out.length) { out(i) = bytes(off + i) & 0xff; i += 1 }
    }
    (color, w, h, out)
  }
}

/** A REAL [[MediaDecoder]] for binary PGM/PPM payloads — same feature
  * semantics as [[BmpMediaDecoder]] (per-pixel BT.601 luminance for
  * color, the gray value itself for PGM; one "frame" per scanline,
  * every [[Multimodal.SampleEvery]]-th scanline sampled), so the two
  * genuine formats are comparable through the unchanged `mm_*`
  * queries. Non-PNM payloads fall back to [[StubDecoder]]. */
object PnmMediaDecoder extends MediaDecoder {
  import Multimodal.{MediaFeatures, MediaRow, SampleEvery}

  private def luma(color: Boolean, p: Int): Int =
    if (color)
      (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
    else p

  def decode(row: MediaRow): MediaFeatures = {
    if (!PnmCodec.isPnm(row.payload)) return StubDecoder.decode(row)
    val (color, width, height, px) = PnmCodec.decode(row.payload)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += luma(color, px(i)); i += 1 }
    var checksum = 0L
    var sampled = 0
    var y = 0
    while (y < height) {
      if (y % SampleEvery == 0) {
        sampled += 1
        var x = 0
        while (x < width) {
          checksum = (checksum * 31 + luma(color, px(y * width + x))) % 1000000007L
          x += 1
        }
      }
      y += 1
    }
    MediaFeatures(row.doc_id, row.media_type, row.payload.length.toLong, sum,
      sum.toDouble / px.length, height, sampled, checksum)
  }
}

/** The decoder REGISTRY: one [[MediaDecoder]] that dispatches each
  * payload to the first format whose validated sniff accepts it —
  * BMP → [[BmpMediaDecoder]], binary PGM/PPM → [[PnmMediaDecoder]],
  * 16-bit PCM WAV → [[WavMediaDecoder]] (a genuinely different
  * MODALITY, not just container), anything else → [[StubDecoder]]. Set
  * `spark.graft.multimodal.decoder` to this object's class name and a
  * MIXED-format media table decodes through the unchanged `mm_*`
  * queries, each row by its own codec — the shape a production media
  * column (heterogeneous formats in one binary column) actually has.
  * Sniffing is per row and header-bounded; a payload no codec claims
  * costs two cheap header checks before the stub path. */
object RegistryMediaDecoder extends MediaDecoder {
  import Multimodal.{MediaFeatures, MediaRow}

  /** Ordered (format, sniff, decoder) entries; first accepting sniff
    * wins. Sniffs are full-header validations, so order is cosmetic. */
  val entries: Seq[(String, Array[Byte] => Boolean, MediaDecoder)] = Seq(
    ("bmp", BmpCodec.isBmp _, BmpMediaDecoder),
    ("pnm", PnmCodec.isPnm _, PnmMediaDecoder),
    ("wav", WavCodec.isWav _, WavMediaDecoder))

  /** Registry name of the codec that would decode this payload. */
  def formatOf(payload: Array[Byte]): String =
    entries.find(_._2(payload)).map(_._1).getOrElse("stub")

  def decode(row: MediaRow): MediaFeatures =
    entries.find(_._2(row.payload)) match {
      case Some((_, _, d)) => d.decode(row)
      case None            => StubDecoder.decode(row)
    }
}
