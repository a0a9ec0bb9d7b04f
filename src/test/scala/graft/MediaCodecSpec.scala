package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.MediaCodec

/** The REAL-codec half of the media boundary: the JDK PNG round trip must
  * reproduce the source pattern exactly (PNG is lossless 8-bit gray — any
  * deviation is a codec-path bug, not noise), the reader context must be
  * reusable across decodes (the per-partition contract), and non-PNG /
  * truncated inputs must be rejected loudly rather than mis-decoded.
  */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG encode→decode round trip reproduces the pattern exactly") {
    val reader = MediaCodec.openReader()
    for (docId <- Seq(0L, 3L, 42L, 999L, 123456L)) {
      val bytes = MediaCodec.synthesizeGrayPng(docId)
      assert(MediaCodec.isPng(bytes), "synthesized stream lacks the PNG magic")
      val d = MediaCodec.decodeGrayPng(reader, bytes)
      val w = MediaCodec.patternWidth(docId)
      val h = MediaCodec.patternHeight(docId)
      assert(d.width == w && d.height == h)
      var sum = 0L; var hash = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaCodec.patternGray(docId, x, y)
        sum += g; hash = (hash * 31 + g) % 1000000007L
      }
      assert(d.pixelSum == sum, s"doc $docId pixel sum drifted")
      assert(d.pixelHash == hash, s"doc $docId pixel order/values drifted")
    }
    reader.dispose()
  }

  test("whtPhash: perceptual locality on structured images") {
    import MediaCodec.GrayRaster
    // The locality property holds for images with low-frequency
    // STRUCTURE (what perceptual hashes are for) — natural-image-like
    // block scenes, not the fixture's spectrally-flat gradient (whose
    // near-tied coefficients legitimately flip under any jitter; the
    // catalog query only needs exactness there, which the oracle pins).
    def scene(seed: Int, jitter: Int): GrayRaster = {
      val w = 32; val h = 32
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val block = (((x / 8) + (y / 8) + seed) % 3) * 90 // coarse blocks
        val grad = (x * (seed % 5 + 1)) / 4               // mild gradient
        // Deterministic texture keeps the spectrum generic: an exactly
        // tied coefficient (common in untextured synthetic blocks, never
        // in photographs) sits ON the median and flips under any epsilon.
        val texture = (x * 31 + y * 57 + seed * 97) % 23
        val noise = if (jitter > 0 && i % 13 == 0) jitter else 0
        math.min(255, block + grad + texture + noise)
      }
      GrayRaster(w, h, px)
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val pairs = (0 until 6).map { s =>
      val clean = MediaCodec.whtPhash(scene(s, 0))
      val jit = MediaCodec.whtPhash(scene(s, 5))
      (clean, hamming(clean, jit))
    }
    // Mild jitter moves few bits on every structured scene...
    pairs.foreach { case (_, d) => assert(d <= 12, s"jitter moved $d bits") }
    // ...while DIFFERENT scenes sit far apart — and strictly farther
    // than any jittered self-pair (the retrieval margin).
    val hashes = pairs.map(_._1)
    val cross = for (i <- hashes.indices; j <- hashes.indices if i < j)
      yield hamming(hashes(i), hashes(j))
    assert(cross.min > pairs.map(_._2).max,
      s"cross-scene min ${cross.min} not above self-jitter max ${pairs.map(_._2).max}")
    // Determinism.
    assert(MediaCodec.whtPhash(scene(2, 0)) == MediaCodec.whtPhash(scene(2, 0)))
  }

  test("non-PNG containers are rejected, not mis-decoded") {
    val reader = MediaCodec.openReader()
    val stubHeader = java.nio.ByteBuffer.allocate(9)
      .putInt(128).putInt(256).put(1.toByte).array()
    assert(!MediaCodec.isPng(stubHeader))
    intercept[IllegalArgumentException] {
      MediaCodec.decodeGrayPng(reader, stubHeader)
    }
    // Truncated PNG: magic intact, stream cut — must throw, never return
    // a half-decoded frame.
    val png = MediaCodec.synthesizeGrayPng(7L)
    intercept[Exception] {
      MediaCodec.decodeGrayPng(reader, png.take(png.length / 2))
    }
    reader.dispose()
  }

  test("nearest-neighbor half resize subsamples even coordinates; odd dims ceil") {
    val reader = MediaCodec.openReader()
    for (docId <- Seq(0L, 1L, 3L, 9L, 42L, 999L)) {
      val full = MediaCodec.decodeGrayRaster(reader, MediaCodec.synthesizeGrayPng(docId))
      val small = MediaCodec.resizeNearestHalf(full)
      assert(small.width == (full.width + 1) / 2 && small.height == (full.height + 1) / 2)
      for (y <- 0 until small.height; x <- 0 until small.width)
        assert(small(x, y) == MediaCodec.patternGray(docId, 2 * x, 2 * y),
          s"doc $docId resized pixel ($x,$y)")
    }
    reader.dispose()
  }

  test("re-encoding a resized raster yields a valid PNG that decodes bit-for-bit") {
    val reader = MediaCodec.openReader()
    val writer = MediaCodec.openWriter()
    for (docId <- Seq(0L, 3L, 42L)) {
      val small = MediaCodec.resizeNearestHalf(
        MediaCodec.decodeGrayRaster(reader, MediaCodec.synthesizeGrayPng(docId)))
      val bytes = MediaCodec.encodeGrayPng(writer, small)
      assert(MediaCodec.isPng(bytes))
      val back = MediaCodec.decodeGrayRaster(reader, bytes)
      assert(back.width == small.width && back.height == small.height)
      assert(back.pixels.toSeq == small.pixels.toSeq)
    }
    writer.dispose(); reader.dispose()
  }

  test("animated GIF round trip reproduces every frame's pattern exactly, contexts reused") {
    val writer = MediaCodec.openGifWriter()
    val reader = MediaCodec.openGifReader()
    // One writer+reader across all assets — the per-partition contract.
    for (docId <- Seq(0L, 1L, 7L, 10L, 42L, 170L)) {
      val bytes = MediaCodec.synthesizeAnimatedGif(writer, docId)
      assert(MediaCodec.isGif(bytes))
      val frames = MediaCodec.decodeGifFrames(reader, bytes)
      assert(frames.size == MediaCodec.gifFrameCount(docId),
        s"doc $docId: frame count ${frames.size}")
      val w = MediaCodec.patternWidth(docId)
      val h = MediaCodec.patternHeight(docId)
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.width == w && fr.height == h, s"doc $docId frame $f dims")
        var sum = 0L; var hash = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val g = MediaCodec.patternGrayFrame(docId, f, x, y)
          sum += g; hash = (hash * 31 + g) % 1000000007L
        }
        assert(fr.pixelSum == sum && fr.pixelHash == hash,
          s"doc $docId frame $f decoded stats diverged — codec not lossless")
      }
    }
    writer.dispose(); reader.dispose()
  }

  test("non-GIF and truncated GIF streams are rejected loudly") {
    val reader = MediaCodec.openGifReader()
    intercept[IllegalArgumentException] {
      MediaCodec.decodeGifFrames(reader, MediaCodec.synthesizeGrayPng(3L))
    }
    val good = {
      val w = MediaCodec.openGifWriter()
      try MediaCodec.synthesizeAnimatedGif(w, 10L) finally w.dispose()
    }
    intercept[Exception] {
      MediaCodec.decodeGifFrames(reader, good.take(good.length / 2))
    }
    reader.dispose()
  }

  test("JPEG decode: dims exact, deterministic, error bounded AND nonzero (really lossy)") {
    val codec = MediaCodec.openJpegCodec()
    try {
      var anyErr = false
      (1L to 60L by 3L).foreach { docId => // the jpeg route: doc_id % 3 == 1
        val bytes = MediaCodec.synthesizeGrayJpeg(codec, docId)
        assert(MediaCodec.isJpeg(bytes), "writer must emit a real JPEG stream")
        val d1 = MediaCodec.decodeGrayJpeg(codec, bytes)
        assert(d1.width == MediaCodec.patternWidth(docId) &&
          d1.height == MediaCodec.patternHeight(docId),
          s"doc $docId: dimensions must survive the lossy round trip")
        // Deterministic: same bytes decode to the same pixels.
        val d2 = MediaCodec.decodeGrayJpeg(codec, bytes)
        assert(d1.pixels.sameElements(d2.pixels), "decode must be deterministic")
        var maxErr = 0
        var i = 0
        while (i < d1.pixels.length) {
          val x = i % d1.width; val y = i / d1.width
          val e = math.abs(d1.pixels(i) - MediaCodec.patternGray(docId, x, y))
          if (e > maxErr) maxErr = e
          i += 1
        }
        // The pattern has hard mod-256 wrap edges; default-quality JPEG
        // rings around them but must stay in a sane envelope.
        assert(maxErr <= 160, s"doc $docId: max |err| $maxErr out of envelope")
        if (maxErr > 0) anyErr = true
      }
      assert(anyErr,
        "every decode was pixel-perfect — that is not a JPEG codec")
    } finally codec.dispose()
  }
}
