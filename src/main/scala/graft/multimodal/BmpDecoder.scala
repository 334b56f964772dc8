package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM BMP codec (BITMAPINFOHEADER, 24-bit uncompressed,
  * bottom-up scanlines with 4-byte row padding) — no native or library
  * dependencies, so the [[MediaDecoder]] seam can be proven on REAL
  * encoded image bytes inside this container. The format follows the
  * public Windows BMP layout; `decode(encode(px)) == px` exactly.
  */
object BmpCodec {
  private val HeaderSize = 14 + 40

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a top-down row-major RGB pixel array (0xRRGGBB ints) as a
    * 24-bit BMP. */
  def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height,
      s"pixel array must be width*height: ${rgb.length} vs ${width}x$height")
    val stride = rowStride(width)
    val size = HeaderSize + stride * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(HeaderSize)
    b.putInt(40).putInt(width).putInt(height)         // positive: bottom-up
      .putShort(1).putShort(24).putInt(0)             // planes, bpp, BI_RGB
      .putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1                                 // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = rgb(y * width + x)
        b.put((p & 0xff).toByte)                       // B
          .put(((p >> 8) & 0xff).toByte)               // G
          .put(((p >> 16) & 0xff).toByte)              // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** True when the payload carries the BMP magic and a FULLY validated
    * 24-bit uncompressed header: positive in-range dimensions, a
    * non-negative pixel offset, and a size check done in LONG space —
    * a hostile/corrupt header must route to the decoder's stub
    * fallback, never crash the task (int overflow on width*3 or a
    * negative offset would defeat a naive check and send decode() out
    * of bounds). */
  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= HeaderSize && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte && {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val off = b.getInt(10)
      val width = b.getInt(18); val height = b.getInt(22)
      b.getShort(28) == 24 && b.getInt(30) == 0 &&
        width > 0 && height > 0 &&
        width <= MaxDim && height <= MaxDim &&
        off >= HeaderSize &&
        bytes.length.toLong >= off.toLong + rowStride(width).toLong * height
    }

  /** Dimension cap for header validation: generous for real images,
    * small enough that width*height and row strides stay far from int
    * overflow (2^15 × 2^15 pixels = 1 GiB-class decoded arrays are
    * already beyond a per-row payload's plausible size). */
  private val MaxDim = 1 << 15

  /** Decode to (width, height, top-down row-major 0xRRGGBB pixels). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(isBmp(bytes), "not a 24-bit uncompressed BMP payload")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val off = b.getInt(10)
    val width = b.getInt(18); val height = b.getInt(22)
    val stride = rowStride(width)
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val rowOff = off + (height - 1 - y) * stride     // stored bottom-up
      var x = 0
      while (x < width) {
        val i = rowOff + x * 3
        out(y * width + x) = ((bytes(i + 2) & 0xff) << 16) |
          ((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)
        x += 1
      }
      y += 1
    }
    (width, height, out)
  }
}

/** A REAL (non-stub) [[MediaDecoder]]: decodes 24-bit BMP payloads with
  * [[BmpCodec]] and derives features from PIXELS, not raw bytes —
  * per-pixel BT.601 integer luminance, one "frame" per scanline, every
  * [[Multimodal.SampleEvery]]-th scanline sampled into the rolling
  * checksum. Field mapping into [[Multimodal.MediaFeatures]]:
  * `n_bytes` stays the payload size, `byte_sum`/`mean_byte` become
  * luminance sum/mean, `n_frames` the image height.
  *
  * Non-BMP payloads fall back to [[StubDecoder]] (deterministic byte
  * statistics), so a session-wide `--conf` swap stays safe on mixed or
  * text-backed media tables. */
object BmpMediaDecoder extends MediaDecoder {
  import Multimodal.{MediaFeatures, MediaRow, SampleEvery}

  private def luma(p: Int): Int =
    (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000

  def decode(row: MediaRow): MediaFeatures = {
    if (!BmpCodec.isBmp(row.payload)) return StubDecoder.decode(row)
    val (width, height, px) = BmpCodec.decode(row.payload)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += luma(px(i)); i += 1 }
    var checksum = 0L
    var sampled = 0
    var y = 0
    while (y < height) {
      if (y % SampleEvery == 0) {
        sampled += 1
        var x = 0
        while (x < width) {
          checksum = (checksum * 31 + luma(px(y * width + x))) % 1000000007L
          x += 1
        }
      }
      y += 1
    }
    MediaFeatures(row.doc_id, row.media_type, row.payload.length.toLong, sum,
      sum.toDouble / px.length, height, sampled, checksum)
  }
}
