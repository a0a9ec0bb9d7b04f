package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.AudioCodec

/** The REAL-codec half of the audio boundary: the JDK WAV round trip
  * must reproduce the PCM test signal exactly (PCM-in-WAV is lossless —
  * deviation is a codec-path bug, not noise), the container must be a
  * genuine RIFF/WAVE stream, and non-WAV / truncated inputs must be
  * rejected loudly. */
class AudioCodecSpec extends AnyFunSuite {

  test("WAV encode→decode round trip reproduces the signal exactly") {
    for (docId <- Seq(0L, 1L, 5L, 42L, 999L, 123457L)) {
      val bytes = AudioCodec.synthesizeWav(docId)
      assert(AudioCodec.isWav(bytes), "synthesized stream lacks the RIFF/WAVE magic")
      val d = AudioCodec.decodeWav(bytes)
      val n = AudioCodec.sampleCount(docId)
      assert(d.nSamples == n)
      var sumAbs = 0L; var sumSq = 0L; var peak = 0; var zc = 0L; var hash = 0L
      var prev = 0
      for (i <- 0 until n) {
        val s = AudioCodec.sample(docId, i)
        sumAbs += math.abs(s); sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
        hash = (hash * 31 + (s + 32768)) % 1000000007L
        prev = s
      }
      assert(d.sumAbs == sumAbs && d.sumSq == sumSq && d.peak == peak,
        s"doc $docId magnitude stats drifted")
      assert(d.zeroCrossings == zc, s"doc $docId zero crossings drifted")
      assert(d.sampleHash == hash, s"doc $docId sample order/values drifted")
    }
  }

  test("decodeSamples matches the formula and framed stats conserve the whole-stream stats") {
    for (docId <- Seq(1L, 13L, 1001L)) {
      val bytes = AudioCodec.synthesizeWav(docId)
      val ss = AudioCodec.decodeSamples(AudioCodec.openReader(), bytes)
      assert(ss.length == AudioCodec.sampleCount(docId))
      assert(ss.indices.forall(i => ss(i) == AudioCodec.sample(docId, i)),
        s"doc $docId decoded samples drifted from the formula")
      // Conservation: per-frame energies/abs-sums over any framing sum to
      // the whole-stream statistics; intra-frame zero crossings can only
      // miss the frame-boundary pairs.
      val d = AudioCodec.decodeWav(bytes)
      val frames = ss.grouped(256).toSeq
      assert(frames.map(_.map(s => s.toLong * s).sum).sum == d.sumSq)
      assert(frames.map(_.map(s => math.abs(s).toLong).sum).sum == d.sumAbs)
      val intraZc = frames.map(f =>
        f.sliding(2).count(p => p.length == 2 &&
          ((p(0) < 0 && p(1) >= 0) || (p(0) >= 0 && p(1) < 0)))).sum
      assert(intraZc <= d.zeroCrossings &&
        d.zeroCrossings - intraZc < frames.length,
        s"doc $docId framed zero-crossings inconsistent with stream total")
    }
  }

  test("the gated voice-shaped signal round-trips and silences are EXACT zeros") {
    for (docId <- Seq(1L, 13L, 1001L)) {
      val bytes = AudioCodec.synthesizeGatedWav(AudioCodec.openWriter(), docId)
      val ss = AudioCodec.decodeSamples(AudioCodec.openReader(), bytes)
      assert(ss.length == AudioCodec.sampleCount(docId))
      assert(ss.indices.forall(i => ss(i) == AudioCodec.gatedSample(docId, i)),
        s"doc $docId gated samples drifted from the formula")
      // Every third 200-sample block is digital silence; the others are
      // the live signal (non-vacuous: some nonzero sample exists there).
      val silent = ss.indices.filter(i => (i / AudioCodec.GateBlock) % 3 == 0)
      assert(silent.forall(ss(_) == 0), s"doc $docId silence not exact")
      assert(ss.indices.exists(i => (i / AudioCodec.GateBlock) % 3 != 0 && ss(i) != 0))
    }
  }

  test("non-WAV and truncated containers are rejected, not mis-decoded") {
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(Array[Byte](1, 2, 3, 4))
    }
    // A real PNG is not a WAV.
    val png = graft.model.MediaCodec.synthesizeGrayPng(7L)
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(png) }
    // RIFF magic intact, stream cut mid-data: must throw or return only
    // complete frames — never fabricate samples. The JDK reader stops at
    // the truncation point; the strict check is that decode NEVER claims
    // the full sample count.
    val wav = AudioCodec.synthesizeWav(9L)
    val cut = wav.take(wav.length / 2)
    val claimed =
      try Some(AudioCodec.decodeWav(cut).nSamples)
      catch { case _: Exception => None }
    assert(claimed.forall(_ < AudioCodec.sampleCount(9L)),
      "truncated WAV decoded to the full sample count")
  }
}
