package graft.model

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** REAL PNG codec path for the multimodal decode boundary — the JDK ships
  * `javax.imageio`, so the PNG half of the media surface needs no external
  * libraries: `mm_decode_png` encodes a deterministic 8-bit gray test
  * pattern into an actual PNG container and decodes actual pixels back out
  * of it. Non-PNG containers (jpeg/webp ids in the synthetic fixture)
  * still route to [[MediaStub]] — the remaining, documented stub scope.
  *
  * The pixel pattern is pure integer arithmetic over (doc_id, x, y), so
  * the DuckDB oracle recomputes the decoded statistics (pixel sum, rolling
  * pixel hash) without ever seeing a PNG: if the encode→decode round trip
  * through the real codec dropped or shifted a single pixel, the oracle
  * comparison fails. PNG is lossless 8-bit gray, so exact equality is the
  * correct expectation.
  */
object MediaCodec {

  /** PNG magic (first 8 bytes of every PNG stream). */
  private val PngSignature =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && PngSignature.indices.forall(i => bytes(i) == PngSignature(i))

  /** Deterministic gray value of pixel (x, y) of document `docId` — the
    * single source of truth for fixture synthesis AND the oracle. */
  def patternGray(docId: Long, x: Int, y: Int): Int =
    (((docId * 31 + 7L * x + 13L * y) % 256) + 256).toInt % 256

  /** Tiny test-pattern dimensions: ≤ 15×12 keeps the oracle's per-doc
    * pixel fold a few hundred terms. */
  def patternWidth(docId: Long): Int = (8 + docId % 8).toInt
  def patternHeight(docId: Long): Int = (8 + docId % 5).toInt

  /** Expensive-to-open writer context, one per partition — `ImageIO
    * .write` per row would re-scan the writer registry and construct an
    * ImageWriter per document, exactly the per-row codec-open cost the
    * decode half hoists. */
  final class PngWriter private[MediaCodec] () {
    private[MediaCodec] val writer =
      ImageIO.getImageWritersByFormatName("png").next()
    def dispose(): Unit = writer.dispose()
  }

  def openWriter(): PngWriter = new PngWriter

  /** Encode the document's gray test pattern as a REAL PNG byte stream. */
  def synthesizeGrayPng(ctx: PngWriter, docId: Long): Array[Byte] = {
    val w = patternWidth(docId)
    val h = patternHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, patternGray(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      ctx.writer.setOutput(ios)
      ctx.writer.write(img)
    } finally ios.close()
    out.toByteArray
  }

  /** One-shot convenience (tests, tools): opens and disposes a writer. */
  def synthesizeGrayPng(docId: Long): Array[Byte] = {
    val ctx = openWriter()
    try synthesizeGrayPng(ctx, docId) finally ctx.dispose()
  }

  /** Decoded real-pixel statistics: (width, height, pixelSum, pixelHash)
    * where pixelHash is the row-major polynomial fold
    * h = (h*31 + gray) mod 1e9+7 (the `text_fingerprint` discipline). */
  final case class DecodedPng(width: Int, height: Int, pixelSum: Long, pixelHash: Long)

  /** A decoded 8-bit gray raster (row-major) — the in-memory form the
    * resize/transform stages operate on. */
  /** The 8 LOWEST-SEQUENCY natural-order Hadamard indices for n = 16
    * (sequency = sign changes of x ↦ (−1)^popcount(u AND x); natural
    * index order does NOT sort by frequency — u = 1 alternates every
    * sample). Shared constant with the mm_phash oracle SQL. */
  val WhtSeq8: Array[Int] = Array(0, 8, 12, 4, 6, 14, 10, 2)

  /** Integer Walsh–Hadamard perceptual signature (wHash family) of a
    * gray raster: nearest-resample to a 16×16 grid, 2-D WHT with
    * sign(u,x) = (−1)^popcount(u AND x) — pure ±1 integer arithmetic, no
    * DCT cosines, so both engines compute it bit-identically — keep the
    * 8×8 LOWEST-SEQUENCY block ([[WhtSeq8]]; the low-frequency energy a
    * perceptual hash must key on), threshold the 63 non-DC coefficients
    * at their exact median (the 32nd of the sorted 63), pack into one
    * 63-bit BIGINT. Near-identical images land at small Hamming
    * distance; the signature is a pure function of the pixels, so the
    * oracle recomputes it from the pattern formula. */
  def whtPhash(r: GrayRaster): Long = {
    val g = new Array[Int](256)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        g(y * 16 + x) = r(x * r.width / 16, y * r.height / 16)
        x += 1
      }
      y += 1
    }
    val cs = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        val un = WhtSeq8(u)
        val vn = WhtSeq8(v)
        var acc = 0L
        var yy = 0
        while (yy < 16) {
          var xx = 0
          while (xx < 16) {
            val neg = (java.lang.Integer.bitCount(un & xx) +
              java.lang.Integer.bitCount(vn & yy)) % 2 == 1
            val p = g(yy * 16 + xx)
            acc += (if (neg) -p else p)
            xx += 1
          }
          yy += 1
        }
        cs(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val nonDc = cs.drop(1)
    val med = nonDc.sorted.apply(31)
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (nonDc(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  final case class GrayRaster(width: Int, height: Int, pixels: Array[Int]) {
    def apply(x: Int, y: Int): Int = pixels(y * width + x)
    /** Row-major (sum, polynomial hash) — the same fold as
      * [[decodeGrayPng]], so stats computed from a raster and stats
      * computed during decode cannot drift. */
    def stats: (Long, Long) = {
      var sum = 0L; var hash = 0L; var i = 0
      while (i < pixels.length) {
        sum += pixels(i); hash = (hash * 31 + pixels(i)) % 1000000007L; i += 1
      }
      (sum, hash)
    }
  }

  /** Decode the full raster (tiny fixtures; a production raster stays
    * inside the partition too — it never shuffles). */
  def decodeGrayRaster(ctx: PngReader, bytes: Array[Byte]): GrayRaster = {
    require(isPng(bytes), "not a PNG stream")
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      ctx.reader.setInput(in, true, true)
      val img = ctx.reader.read(0)
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      GrayRaster(w, h, px)
    } finally in.close()
  }

  /** Nearest-neighbor half-resolution downsample: output (ceil(w/2),
    * ceil(h/2)), output pixel (x, y) = input pixel (2x, 2y) — the
    * deterministic thumbnail/feature-pyramid step, chosen over
    * interpolation because it is exactly recomputable from the source
    * pattern (the oracle evaluates the pattern at even coordinates). */
  def resizeNearestHalf(r: GrayRaster): GrayRaster = {
    val rw = (r.width + 1) / 2
    val rh = (r.height + 1) / 2
    val out = new Array[Int](rw * rh)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) { out(y * rw + x) = r(2 * x, 2 * y); x += 1 }
      y += 1
    }
    GrayRaster(rw, rh, out)
  }

  /** Re-encode an arbitrary gray raster as a REAL PNG byte stream (the
    * thumbnail write-back half of the resize boundary). */
  def encodeGrayPng(ctx: PngWriter, r: GrayRaster): Array[Byte] = {
    val img = new BufferedImage(r.width, r.height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < r.height) {
      var x = 0
      while (x < r.width) { raster.setSample(x, y, 0, r(x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      ctx.writer.setOutput(ios)
      ctx.writer.write(img)
    } finally ios.close()
    out.toByteArray
  }

  /** Expensive-to-open reader context, one per partition (the same
    * contract as [[MediaStub.openCodec]], but real). */
  final class PngReader private[MediaCodec] () {
    private[MediaCodec] val reader =
      ImageIO.getImageReadersByFormatName("png").next()
    def dispose(): Unit = reader.dispose()
  }

  def openReader(): PngReader = new PngReader

  // ── JPEG: the LOSSY codec (r11) ─────────────────────────────────────
  //
  // javax.imageio ships a real JPEG plugin, so the jpeg route no longer
  // needs MediaStub — but JPEG is lossy BY DESIGN, which changes the
  // verification discipline: the binary oracle gate cannot apply
  // (decoded pixels are codec-defined, not pattern-defined), so
  // `mm_decode_jpeg` emits the per-asset reconstruction-error statistics
  // against the source pattern and the SPEC pins the honest contract
  // instead: dimensions exact, decode deterministic (same bytes → same
  // pixels), error bounded, and error NONZERO somewhere (a fake decode
  // that echoed the pattern would be suspiciously perfect). The driver
  // records the rows-only check — the same honesty tier as other
  // non-SQL-expressible ops.

  /** JPEG magic (SOI marker). */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte

  /** Writer+reader context pair, one per partition. */
  final class JpegCodec private[MediaCodec] () {
    private[MediaCodec] val writer =
      ImageIO.getImageWritersByFormatName("jpeg").next()
    private[MediaCodec] val reader =
      ImageIO.getImageReadersByFormatName("jpeg").next()
    def dispose(): Unit = { writer.dispose(); reader.dispose() }
  }

  def openJpegCodec(): JpegCodec = new JpegCodec

  /** Encode the document's gray test pattern as a REAL JPEG stream
    * (default quality — the lossiness is the point). */
  def synthesizeGrayJpeg(ctx: JpegCodec, docId: Long): Array[Byte] = {
    val w = patternWidth(docId)
    val h = patternHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, patternGray(docId, x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      ctx.writer.setOutput(ios)
      ctx.writer.write(img)
    } finally ios.close()
    out.toByteArray
  }

  /** Decode a JPEG stream to the gray raster. */
  def decodeGrayJpeg(ctx: JpegCodec, bytes: Array[Byte]): GrayRaster = {
    require(isJpeg(bytes), "not a JPEG stream")
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      ctx.reader.setInput(in, true, true)
      val img = ctx.reader.read(0)
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      GrayRaster(w, h, px)
    } finally in.close()
  }

  // ── GIF: the multi-frame container (r11) ────────────────────────────
  //
  // The JDK's javax.imageio GIF plugin reads AND writes multi-image
  // sequences, which upgrades `mm_frame_sample`'s stride *plumbing* into
  // actual frame extraction from an actual animated container
  // (`mm_decode_gif`). Frames are 8-bit indexed with an identity gray
  // palette (entry i = gray i), so the palette round trip is lossless
  // and the same oracle discipline as PNG applies: per-frame pixels are
  // integer arithmetic over (doc_id, frame, x, y), and one frame dropped,
  // reordered, or quantized by the codec fails the per-frame hash.

  /** GIF magic ("GIF8" — covers 87a and 89a). */
  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8'

  /** Deterministic gray value of pixel (x, y) in frame `frame` — the
    * single source of truth for synthesis AND the oracle (the animated
    * sibling of [[patternGray]]). */
  def patternGrayFrame(docId: Long, frame: Int, x: Int, y: Int): Int =
    (((docId * 31 + 17L * frame + 7L * x + 13L * y) % 256) + 256).toInt % 256

  /** Frames per synthetic animation: 4..12 — enough that the ceil(n/8)
    * sampling stride takes both of its values. */
  def gifFrameCount(docId: Long): Int = (4 + docId % 9).toInt

  /** Identity 256-gray palette: index i maps to rgb(i, i, i), so an
    * indexed raster encodes gray values losslessly through the GIF
    * color table. */
  private val grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  final class GifWriter private[MediaCodec] () {
    private[MediaCodec] val writer =
      ImageIO.getImageWritersByFormatName("gif").next()
    def dispose(): Unit = writer.dispose()
  }
  def openGifWriter(): GifWriter = new GifWriter

  final class GifReader private[MediaCodec] () {
    private[MediaCodec] val reader =
      ImageIO.getImageReadersByFormatName("gif").next()
    def dispose(): Unit = reader.dispose()
  }
  def openGifReader(): GifReader = new GifReader

  /** Encode the document's animated gray test pattern as a REAL
    * multi-frame GIF byte stream (`prepareWriteSequence` /
    * `writeToSequence` — the actual animation API, not N separate
    * single-frame files). */
  def synthesizeAnimatedGif(ctx: GifWriter, docId: Long): Array[Byte] = {
    val w = patternWidth(docId)
    val h = patternHeight(docId)
    val out = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      ctx.writer.setOutput(ios)
      ctx.writer.prepareWriteSequence(null)
      var f = 0
      val n = gifFrameCount(docId)
      while (f < n) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, patternGrayFrame(docId, f, x, y)); x += 1
          }
          y += 1
        }
        ctx.writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      ctx.writer.endWriteSequence()
    } finally ios.close()
    out.toByteArray
  }

  /** One decoded animation frame's real-pixel statistics (same fold as
    * [[DecodedPng]]). */
  final case class DecodedGifFrame(frameIdx: Int, width: Int, height: Int,
      pixelSum: Long, pixelHash: Long)

  /** Decode EVERY frame of a multi-frame GIF from the actual byte
    * stream. Gray values are read through `getRGB` (palette lookup), so
    * the statistics cannot silently depend on color-table ORDER — only
    * on the colors the codec actually reproduces. */
  def decodeGifFrames(ctx: GifReader, bytes: Array[Byte]): IndexedSeq[DecodedGifFrame] = {
    require(isGif(bytes), "not a GIF stream")
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      // seekForwardOnly=false: getNumImages(true) must be free to scan.
      ctx.reader.setInput(in, false, true)
      val n = ctx.reader.getNumImages(true)
      (0 until n).map { i =>
        val img = ctx.reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var hash = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = img.getRGB(x, y) & 0xff
            sum += g
            hash = (hash * 31 + g) % 1000000007L
            x += 1
          }
          y += 1
        }
        DecodedGifFrame(i, w, h, sum, hash)
      }
    } finally in.close()
  }

  def decodeGrayPng(ctx: PngReader, bytes: Array[Byte]): DecodedPng = {
    require(isPng(bytes), "not a PNG stream")
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      ctx.reader.setInput(in, true, true)
      val img = ctx.reader.read(0)
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var sum = 0L
      var hash = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = raster.getSample(x, y, 0)
          sum += g
          hash = (hash * 31 + g) % 1000000007L
          x += 1
        }
        y += 1
      }
      DecodedPng(w, h, sum, hash)
    } finally in.close()
  }
}
