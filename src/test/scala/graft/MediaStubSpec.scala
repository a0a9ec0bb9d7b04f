package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.MediaStub

/** The stub codec must be TOTAL over arbitrary header bytes wherever the
  * SQL oracle is (ADVICE r5): format ids beyond the table fold into the
  * oracle's ELSE branch, and inputs where the two engines' integer parses
  * would diverge are rejected loudly rather than silently disagreeing. */
class MediaStubSpec extends AnyFunSuite {

  private def header(w: Int, h: Int, fmt: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9)
    b.putInt(w).putInt(h).put(fmt.toByte)
    b.array()
  }

  private val codec = MediaStub.openCodec()

  test("format ids 0/1/2 decode to the format table") {
    assert(MediaStub.decode(codec, header(64, 64, 0)).format === "png")
    assert(MediaStub.decode(codec, header(64, 64, 1)).format === "jpeg")
    assert(MediaStub.decode(codec, header(64, 64, 2)).format === "webp")
  }

  test("format ids >= 3 fold into the last format (the oracle's ELSE branch)") {
    assert(MediaStub.decode(codec, header(64, 64, 3)).format === "webp")
    assert(MediaStub.decode(codec, header(64, 64, 255)).format === "webp")
  }

  test("sign-bit dimensions are rejected, not silently negative") {
    val bad = header(-1, 64, 0) // be32 would read 0xFFFFFFFF as -1
    val e = intercept[IllegalArgumentException](MediaStub.decode(codec, bad))
    assert(e.getMessage.contains("31-bit header domain"))
  }

  test("truncated headers are rejected") {
    intercept[IllegalArgumentException](MediaStub.decode(codec, Array[Byte](1, 2, 3)))
  }

  test("luma is deterministic in the header alone") {
    val a = MediaStub.decode(codec, header(320, 256, 1))
    val b = MediaStub.decode(codec, header(320, 256, 2))
    assert(a.meanLuma === b.meanLuma)
    assert(a.meanLuma >= 0.0 && a.meanLuma <= 1.0)
  }
}
