package graft.model

/** STUB media codec for multimodal columns.
  *
  * SCOPE (narrowed in r10, again in r11): the PNG path is REAL — see
  * [[graft.model.MediaCodec]], which encodes/decodes actual PNG streams
  * through the JDK's `javax.imageio` and computes pixel statistics from
  * the decoded raster (`mm_decode_png`, `mm_resize`) — and so are WAV
  * audio ([[AudioCodec]], `mm_decode_wav`) and, since r11, multi-frame
  * animated GIF (`MediaCodec.decodeGifFrames`, `mm_decode_gif`: real
  * frame extraction from a real animation container). JPEG also left
  * the stub late in r11: `mm_decode_jpeg` runs the JDK's real (lossy)
  * JPEG codec with the honest verification tier lossiness demands —
  * reconstruction-error statistics + spec-pinned bounds instead of a
  * binary oracle (the stub route inside `mm_decode_png`/`mm_decode_stub`
  * keeps exercising the jpeg HEADER id for plumbing coverage). This stub
  * therefore remains only for webp — no JDK decoder exists in this
  * environment. The container header layout is real and
  * parsed for real — 4-byte big-endian width, 4-byte height, 1-byte
  * format id — only the pixel-level work (`meanLuma`) is a deterministic
  * fake so the surrounding Spark plumbing (binary columns, per-partition
  * codec reuse, typed Dataset output) can be exercised and tested.
  */
object MediaStub {

  final case class Decoded(width: Int, height: Int, format: String, meanLuma: Double)

  /** Placeholder for an expensive native codec context; real decoders
    * must be opened once per partition, not per row. */
  final class Codec private[MediaStub] ()

  def openCodec(): Codec = new Codec

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  val formats: Array[String] = Array("png", "jpeg", "webp")

  /** Total over arbitrary bytes, matching the SQL oracle's CASE on every
    * input it accepts: format ids ≥ 2 all decode as the last format (the
    * oracle's ELSE branch), and a width/height with the sign bit set —
    * where the two engines' integer parses would diverge (negative via
    * be32 here, overflow via `('0x'…)::INT` in DuckDB) — is rejected
    * loudly instead of silently disagreeing. */
  def decode(codec: Codec, media: Array[Byte]): Decoded = {
    require(media.length >= 9, s"truncated media header: ${media.length} bytes")
    val w = be32(media, 0)
    val h = be32(media, 4)
    require(w >= 0 && h >= 0,
      s"media dimensions out of the 31-bit header domain: ${w}x$h")
    val f = formats(math.min(media(8) & 0xff, formats.length - 1))
    // STUB pixel statistic: deterministic function of the header bytes.
    // A real decoder would scan the frame buffer here.
    val luma = ((w.toLong * 31 + h) % 256).toDouble / 255.0
    Decoded(w, h, f, luma)
  }
}
