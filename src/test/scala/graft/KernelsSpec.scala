package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Kernels

/** Property + vector tests for the custom scalar kernels (SURVEY §2 B6, B7,
  * F3, F6). Vectors were generated with independent model implementations
  * (Python `uuid` stdlib; the byte-permutation from
  * `cdc_kafka/validation.py:19-41`). */
class KernelsSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  // Whole code points (the emoji is a surrogate pair — never split it).
  private val alphabet = Seq("a", "b", "X", " ", "0", "!", "é", "中", "😀")
  private def randomStr(max: Int): String =
    Seq.fill(rng.nextInt(max + 1))(alphabet(rng.nextInt(alphabet.length))).mkString

  private def t(s: String, max: Int): String =
    Kernels.truncateUtf8(UTF8String.fromString(s), max).toString

  test("truncateUtf8: ASCII truncates at the byte limit") {
    assert(t("hello world", 5) == "hello")
    assert(t("hi", 5) == "hi")
    assert(t("hi", 0) == "")
    assert(t("hi", -3) == "")
  }

  test("truncateUtf8: never splits a multibyte character") {
    assert(t("aé", 2) == "a")     // é = 2 bytes; cutting at 2 would split it
    assert(t("aé", 3) == "aé")
    assert(t("中文", 4) == "中")   // each CJK char = 3 bytes
    assert(t("😀x", 3) == "") // emoji = 4 bytes
    assert(t("😀x", 4) == "😀")
  }

  test("truncateUtf8 properties: bounded, prefix-preserving, valid UTF-8") {
    for (_ <- 1 to 500) {
      val s = randomStr(20)
      val max = rng.nextInt(43) - 2
      val out = t(s, max)
      val outBytes = out.getBytes("UTF-8")
      assert(outBytes.length <= math.max(0, max))
      assert(s.startsWith(out))
      // valid UTF-8 roundtrip (no split surrogate/partial char)
      assert(new String(outBytes, "UTF-8") == out)
    }
  }

  private def mask(names: Seq[String], bytes: Int*): Seq[String] = {
    val arr = new GenericArrayData(names.map(UTF8String.fromString).toArray[Any])
    val res = Kernels.maskToNames(bytes.map(_.toByte).toArray, arr)
    (0 until res.numElements()).map(res.getUTF8String(_).toString)
  }

  test("maskToNames: LSB-first from the last byte (SQL Server bit order)") {
    val names = Seq("c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9")
    assert(mask(names, 0x00, 0x01) == Seq("c0"))
    assert(mask(names, 0x00, 0x05) == Seq("c0", "c2"))
    assert(mask(names, 0x01, 0x00) == Seq("c8"))
    assert(mask(names, 0x03, 0xff) == names.take(10))
    assert(mask(names, 0x00, 0x00) == Seq.empty)
  }

  test("maskToNames: mask wider than the name list is safely bounded") {
    assert(mask(Seq("a"), 0xff, 0xff) == Seq("a"))
  }

  test("sqlServerUuidSortKey vectors (reference permutation)") {
    def key(u: String): String =
      Kernels.sqlServerUuidSortKey(UTF8String.fromString(u))
        .map(b => f"${b & 0xff}%02x").mkString
    assert(key("00112233-4455-6677-8899-aabbccddeeff") ==
      "aabbccddeeff88997766554433221100")
    assert(key("fe42b271-621b-5a7e-83d8-f4b2e490868c") ==
      "f4b2e490868c83d87e5a1b6271b242fe")
  }

  test("sqlServerUuidSortKey is a byte permutation") {
    for (_ <- 1 to 300) {
      val h = Seq.fill(32)("0123456789abcdef"(rng.nextInt(16))).mkString
      val u = s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-${h.substring(16, 20)}-${h.substring(20)}"
      val key = Kernels.sqlServerUuidSortKey(UTF8String.fromString(u))
      assert(key.length == 16)
      val origPairs = h.grouped(2).toSeq.sorted
      val keyPairs = key.map(b => f"${b & 0xff}%02x").toSeq.sorted
      assert(origPairs == keyPairs)
    }
  }

  test("row_uuid vectors (Python: md5(md5hex(seed) + name) with v3/variant nibbles)") {
    def u3(seed: String, name: String): String =
      Kernels.rowUuid(UTF8String.fromString(seed), UTF8String.fromString(name)).toString
    assert(u3("dbo.events", "") == "5d4ac34a-82f6-3aa6-b321-d78cd831ad20")
    assert(u3("dbo.events", "42signup{\"k\": 0}") ==
      "939e5401-35ba-3d8f-a780-30c1f6b99af6")
    assert(u3("a.b", "hello world") == "6d90d9be-6bed-3dfe-9a5c-b84303449564")
    assert(u3("x", "é中文") == "46a49edf-6792-374b-a390-2a1d6b03e768")
  }

  test("row_uuid has RFC 4122 version and variant bits") {
    for (_ <- 1 to 300) {
      val seed = randomStr(10); val name = randomStr(20)
      val out = Kernels.rowUuid(UTF8String.fromString(seed), UTF8String.fromString(name)).toString
      assert(out.length == 36)
      assert(out.charAt(14) == '3')
      assert("89ab".contains(out.charAt(19)))
    }
  }

  test("substringAnchors: matches the literal every-offset SQL model, position-independent") {
    // The literal per-window model the DuckDB oracle runs: dual Horner
    // fold (bases 31/131 mod 1e9+7) over each window's CODE POINTS,
    // combined h1*2^30 + h2 — re-folded from scratch per offset, which
    // is exactly what the kernel's O(1) rolling update must equal.
    def model(text: String, width: Int, m: Int): Set[Long] = {
      val cps = text.codePoints().toArray
      (0 to cps.length - width).iterator.map { i =>
        var h1 = 0L; var h2 = 0L
        var j = i
        while (j < i + width) {
          h1 = (h1 * Kernels.AnchorBase1 + cps(j)) % Kernels.AnchorHashModulus
          h2 = (h2 * Kernels.AnchorBase2 + cps(j)) % Kernels.AnchorHashModulus
          j += 1
        }
        h1 * 1073741824L + h2
      }.filter(_ % m == 0).toSet
    }
    for (trial <- 1 to 60) {
      val s = randomStr(200)
      val got = Kernels.substringAnchors(UTF8String.fromString(s), 8, 4)
        .toLongArray().toSet
      assert(got === model(s, 8, 4), s"trial $trial on '$s'")
    }
    // Position independence: a shared passage selects the same anchors
    // regardless of its offset in the document.
    val passage = randomStr(120)
    val a = Kernels.substringAnchors(
      UTF8String.fromString("PREFIX-ONE " + passage), 8, 4).toLongArray().toSet
    val b = Kernels.substringAnchors(
      UTF8String.fromString("a totally different and longer prefix " + passage),
      8, 4).toLongArray().toSet
    val pOnly = Kernels.substringAnchors(
      UTF8String.fromString(passage), 8, 4).toLongArray().toSet
    assert(pOnly.subsetOf(a) && pOnly.subsetOf(b))
    // Empty/short inputs yield no anchors.
    assert(Kernels.substringAnchors(UTF8String.fromString(""), 8, 4)
      .numElements() === 0)
    assert(Kernels.substringAnchors(UTF8String.fromString("short"), 8, 4)
      .numElements() === 0)
  }

  test("featBuckets: matches the HOF model (distinct uni+bigrams, md5 top-60 mod B)") {
    // Independent model: split on single space (trailing empties kept),
    // distinct grams in first-occurrence order, H(g) % B.
    def model(s: String, b: Int): Seq[Long] = {
      val ws = s.split(" ", -1).toSeq
      val grams = (ws ++ ws.zip(ws.drop(1)).map { case (a, c) => s"$a $c" }).distinct
      grams.map(g => Kernels.md5Top60(g.getBytes("UTF-8")) % b)
    }
    val cases = Seq("", "one", "a b", "a b c a b", "x  y", " lead", "trail ",
      "\u00e9 \u4e2d \ud83d\ude00 \u00e9 \u4e2d") ++ Seq.fill(50)(randomStr(40))
    cases.foreach { s =>
      val got = Kernels.featBuckets(UTF8String.fromString(s), 4096)
      val want = model(s, 4096)
      assert(got.toLongArray().toSeq == want, s"mismatch for '$s'")
    }
  }
}
