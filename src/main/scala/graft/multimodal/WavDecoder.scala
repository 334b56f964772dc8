package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM WAV (RIFF PCM) codec — 16-bit integer PCM, mono or
  * stereo — the third REAL format behind the [[MediaDecoder]] seam and
  * the first AUDIO one, so the registry dispatch is proven across
  * modalities, not just across image containers. The layout follows the
  * public RIFF/WAVE spec: `RIFF <size> WAVE`, then a chunk walk to a
  * PCM `fmt ` chunk and a `data` chunk (unknown chunks — `LIST`,
  * `fact`, … — are skipped, as real encoders emit them).
  * `decode(encode(samples)) == samples` exactly; anything that is not
  * fully-valid 16-bit PCM routes to the stub fallback like any other
  * unknown payload.
  */
object WavCodec {

  /** Frame-count cap for header validation — same rationale as
    * BmpCodec.MaxDim: a hostile header must fail the sniff, never
    * drive a giant allocation. 2^26 frames ≈ 23 min of stereo 48 kHz. */
  private val MaxFrames = 1L << 26
  private val MaxRate   = 384000L

  /** Encode interleaved 16-bit samples as canonical PCM WAV. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels must be 1 or 2: $channels")
    require(sampleRate > 0 && sampleRate <= MaxRate, s"bad sample rate: $sampleRate")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataLen = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1.toShort)                       // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * 2)         // byte rate
    b.putShort((channels * 2).toShort)          // block align
    b.putShort(16.toShort)                      // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  private def le16(bytes: Array[Byte], o: Int): Int =
    (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
  private def le32(bytes: Array[Byte], o: Int): Long =
    (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
  private def tag(bytes: Array[Byte], o: Int): String =
    new String(bytes, o, 4, "US-ASCII")

  /** Parsed header: (channels, sampleRate, data offset, PCM frames), or
    * None when the payload is not fully-valid 16-bit PCM WAV. The chunk
    * walk and every bound check run in LONG space and are monotone in
    * the offset, so a hostile header (absurd chunk sizes, truncated
    * data, missing fmt) returns None, never throws, overflows, or
    * loops. */
  private[multimodal] def parseHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12L
    var fmt: Option[(Int, Int)] = None            // (channels, rate)
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off.toInt)
      val sz = le32(bytes, off.toInt + 4)
      val body = off + 8
      if (body + sz > bytes.length) return None   // truncated chunk
      if (id == "fmt ") {
        if (sz < 16) return None
        val o = body.toInt
        val audioFormat = le16(bytes, o)
        val channels = le16(bytes, o + 2)
        val rate = le32(bytes, o + 4)
        val blockAlign = le16(bytes, o + 12)
        val bits = le16(bytes, o + 14)
        if (audioFormat != 1 || bits != 16) return None
        if (channels < 1 || channels > 2) return None
        if (rate < 1 || rate > MaxRate) return None
        if (blockAlign != channels * 2) return None
        fmt = Some((channels, rate.toInt))
      } else if (id == "data") {
        fmt match {
          case None => return None                // data before fmt
          case Some((ch, rate)) =>
            val align = ch * 2
            if (sz % align != 0) return None
            val frames = sz / align
            if (frames < 1 || frames > MaxFrames) return None
            return Some((ch, rate, body.toInt, frames.toInt))
        }
      }
      off = body + sz + (sz & 1)                  // RIFF chunks pad to even
    }
    None                                          // no data chunk found
  }

  /** True when the payload is fully-validated 16-bit PCM WAV. */
  def isWav(bytes: Array[Byte]): Boolean = parseHeader(bytes).isDefined

  /** Decode to (channels, sampleRate, interleaved 16-bit samples). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    val (ch, rate, off, frames) = parseHeader(bytes)
      .getOrElse(throw new IllegalArgumentException("not a 16-bit PCM WAV payload"))
    val out = new Array[Short](frames * ch)
    var i = 0
    while (i < out.length) { out(i) = le16(bytes, off + i * 2).toShort; i += 1 }
    (ch, rate, out)
  }
}

/** A REAL [[MediaDecoder]] for 16-bit PCM WAV payloads — the audio
  * analog of [[BmpMediaDecoder]]'s pixel features, mapped onto the same
  * [[Multimodal.MediaFeatures]] schema: the per-sample statistic is the
  * 8-bit AMPLITUDE magnitude |s|/256 (0..128, the audio counterpart of
  * luminance), an audio "frame" is a [[WavMediaDecoder.BlockFrames]]-PCM-
  * frame block (10 ms at 16 kHz), and every
  * [[Multimodal.SampleEvery]]-th block is checksummed — so audio rows
  * are comparable to image rows through the unchanged `mm_*` queries.
  * Non-WAV payloads fall back to [[StubDecoder]]. */
object WavMediaDecoder extends MediaDecoder {
  import Multimodal.{MediaFeatures, MediaRow, SampleEvery}

  /** PCM frames per feature block: 10 ms at 16 kHz. */
  val BlockFrames = 160

  private def amp(s: Short): Long = math.abs(s.toInt).toLong >> 8

  /** SPECTRAL features over interleaved 16-bit samples — the audio-only
    * feature family the image path has no analog of (r9 verdict
    * stretch #8). Pure integer arithmetic so a SQL oracle can replay
    * it exactly:
    *  - zero-crossing COUNT: positions i ≥ 1 where sign(s[i−1]) ≠
    *    sign(s[i]), with 0 counted non-negative — the classic cheap
    *    voiced/unvoiced & noisiness proxy (a time-domain stand-in for
    *    spectral centroid);
    *  - block ENERGY: Σ s² per [[BlockFrames]]·ch-sample block (10 ms
    *    at 16 kHz mono) — the max block is the clipping/transient
    *    detector, the total the loudness normalizer's input. s² ≤ 2³⁰
    *    so a 23-minute MaxFrames clip stays far inside Long range.
    * Returns (zeroCrossings, maxBlockEnergy, totalEnergy). */
  def spectral(samples: Array[Short], ch: Int): (Long, Long, Long) = {
    val step = BlockFrames * math.max(ch, 1)
    var zc = 0L; var tot = 0L; var maxBlk = 0L; var cur = 0L
    var i = 0
    var blockEnd = step
    val n = samples.length
    while (i < n) {
      val v = samples(i).toLong
      tot += v * v; cur += v * v
      if (i > 0 && ((samples(i - 1) < 0) != (samples(i) < 0))) zc += 1
      i += 1
      if (i == blockEnd || i == n) {
        if (cur > maxBlk) maxBlk = cur
        cur = 0L; blockEnd += step
      }
    }
    (zc, maxBlk, tot)
  }

  def decode(row: MediaRow): MediaFeatures = {
    if (!WavCodec.isWav(row.payload)) return StubDecoder.decode(row)
    val (ch, _, samples) = WavCodec.decode(row.payload)
    var sum = 0L
    var i = 0
    while (i < samples.length) { sum += amp(samples(i)); i += 1 }
    val pcmFrames = samples.length / ch
    val nBlocks = (pcmFrames + BlockFrames - 1) / BlockFrames
    var checksum = 0L
    var sampled = 0
    var blk = 0
    while (blk < nBlocks) {
      if (blk % SampleEvery == 0) {
        sampled += 1
        var j = blk * BlockFrames * ch
        val end = math.min(j + BlockFrames * ch, samples.length)
        while (j < end) {
          checksum = (checksum * 31 + amp(samples(j))) % 1000000007L
          j += 1
        }
      }
      blk += 1
    }
    MediaFeatures(row.doc_id, row.media_type, row.payload.length.toLong, sum,
      sum.toDouble / samples.length, nBlocks, sampled, checksum)
  }
}
