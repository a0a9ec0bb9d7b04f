package graft.model

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}

/** REAL audio container codec through the JDK's `javax.sound.sampled`
  * WAV support — the audio sibling of [[MediaCodec]]'s PNG path: a
  * deterministic 16-bit PCM test signal is encoded into an actual WAV
  * container (RIFF header, fmt/data chunks — written by the JDK, not by
  * hand) and decoded back to real samples; the signal statistics are
  * computed from the DECODED stream. PCM-in-WAV is lossless, so a single
  * sample dropped, reordered, or byte-swapped by the container round
  * trip changes the exact integer statistics and fails the oracle
  * compare.
  *
  * The sample formula is pure integer arithmetic over (doc_id, i), so
  * the DuckDB oracle recomputes every statistic without touching a WAV:
  *   s(doc, i) = ((doc·7919 + i·2654435761) mod 65536) − 32768
  * (positive operands before the mod on both engines).
  */
object AudioCodec {

  val SampleRate = 8000f

  /** Deterministic 16-bit sample i of document `docId`. */
  def sample(docId: Long, i: Int): Int =
    ((docId * 7919L + i.toLong * 2654435761L) % 65536L).toInt - 32768

  /** 800..1599 samples (0.1-0.2 s at 8 kHz) — bounded like the PNG
    * pattern dims, so the oracle's per-doc fold stays cheap. */
  def sampleCount(docId: Long): Int = (800 + docId % 800).toInt

  /** Speech/silence gate period (samples): every third 200-sample block
    * is EXACT digital silence — the activity structure mm_vad_segments
    * detects. Aligned to the VAD frame length (gate % frame == 0), so
    * frames are purely speech or purely silence by construction. */
  val GateBlock = 200

  /** Deterministic GATED sample: the test signal with silence inserted
    * in blocks 0, 3, 6, … — what a push-to-talk/voice recording looks
    * like to a VAD front end. */
  def gatedSample(docId: Long, i: Int): Int =
    if ((i / GateBlock) % 3 == 0) 0 else sample(docId, i)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  private val format =
    new AudioFormat(SampleRate, 16, 1, true /*signed*/, false /*little-endian*/)

  /** Expensive-to-open writer context, one per partition: the static
    * `AudioSystem.write` entry point re-scans the SPI provider registry
    * per call — the per-row codec-open cost the PNG path's
    * `MediaCodec.PngWriter` exists to hoist, applied to audio. */
  final class WavWriter private[AudioCodec] () {
    private[AudioCodec] val writer: javax.sound.sampled.spi.AudioFileWriter = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
      var found: javax.sound.sampled.spi.AudioFileWriter = null
      while (found == null && it.hasNext) {
        val w = it.next()
        if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
      }
      require(found != null, "no WAV AudioFileWriter provider on this JDK")
      found
    }
  }

  def openWriter(): WavWriter = new WavWriter

  /** Expensive-to-open reader context, one per partition: the static
    * `AudioSystem.getAudioInputStream` probes EVERY installed
    * AudioFileReader with exception-driven parsing per call; this pins
    * the WAV-capable provider once (selected by probing a synthesized
    * container, not by class name). */
  final class WavReader private[AudioCodec] () {
    private[AudioCodec] val reader: javax.sound.sampled.spi.AudioFileReader = {
      val probe = synthesizeWav(new WavWriter, 0L)
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      var found: javax.sound.sampled.spi.AudioFileReader = null
      while (found == null && it.hasNext) {
        val r = it.next()
        try {
          val s = r.getAudioInputStream(new ByteArrayInputStream(probe))
          s.close(); found = r
        } catch { case _: Exception => () }
      }
      require(found != null, "no WAV AudioFileReader provider on this JDK")
      found
    }
  }

  def openReader(): WavReader = new WavReader

  /** Encode the document's PCM test signal as a REAL WAV byte stream,
    * through a per-partition writer context. */
  def synthesizeWav(ctx: WavWriter, docId: Long): Array[Byte] = {
    val n = sampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(docId, i)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), format, n.toLong)
    val out = new ByteArrayOutputStream()
    try ctx.writer.write(in, AudioFileFormat.Type.WAVE, out) finally in.close()
    out.toByteArray
  }

  /** One-shot convenience (tests, tools): opens a writer per call. */
  def synthesizeWav(docId: Long): Array[Byte] = synthesizeWav(new WavWriter, docId)

  /** Encode the GATED signal ([[gatedSample]]) as a REAL WAV byte
    * stream — the voice-shaped asset class mm_vad_segments decodes. */
  def synthesizeGatedWav(ctx: WavWriter, docId: Long): Array[Byte] = {
    val n = sampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = gatedSample(docId, i)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), format, n.toLong)
    val out = new ByteArrayOutputStream()
    try ctx.writer.write(in, AudioFileFormat.Type.WAVE, out) finally in.close()
    out.toByteArray
  }

  /** Decoded real-sample statistics: all exact integers (sum of squares
    * instead of RMS — no sqrt in the compare path), plus the row-order
    * polynomial hash (the MediaCodec pixel-hash discipline, over the
    * NON-NEGATIVE shifted sample so the fold stays in [0, 1e9+7)). */
  final case class DecodedWav(nSamples: Long, sumAbs: Long, sumSq: Long,
      peak: Int, zeroCrossings: Long, sampleHash: Long)

  def decodeWav(ctx: WavReader, bytes: Array[Byte]): DecodedWav = {
    require(isWav(bytes), "not a WAV stream")
    val ais = ctx.reader.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"unexpected decoded format: $f")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      var sumAbs = 0L; var sumSq = 0L; var peak = 0; var zc = 0L; var hash = 0L
      var prev = 0; var i = 0
      while (i < n) {
        val s = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        sumAbs += math.abs(s)
        sumSq += s.toLong * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (i > 0 && ((prev < 0 && s >= 0) || (prev >= 0 && s < 0))) zc += 1
        hash = (hash * 31 + (s + 32768)) % 1000000007L
        prev = s
        i += 1
      }
      DecodedWav(n.toLong, sumAbs, sumSq, peak, zc, hash)
    } finally ais.close()
  }

  /** One-shot convenience (tests, tools): opens a reader per call. */
  def decodeWav(bytes: Array[Byte]): DecodedWav = decodeWav(new WavReader, bytes)

  /** Decode the container to its raw sample vector (the input to framed
    * feature extraction — [[graft.queries.MultimodalQueries]]'s
    * `mm_audio_features`). Same format requirements as [[decodeWav]]. */
  def decodeSamples(ctx: WavReader, bytes: Array[Byte]): Array[Int] = {
    require(isWav(bytes), "not a WAV stream")
    val ais = ctx.reader.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"unexpected decoded format: $f")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      out
    } finally ais.close()
  }
}
