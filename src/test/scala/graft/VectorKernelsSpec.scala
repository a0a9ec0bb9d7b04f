package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Kernels

/** Model-equivalence tests for the fused performance kernels: each must
  * produce EXACTLY the values of the naive formulation the DuckDB oracle
  * evaluates. */
class VectorKernelsSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(99)

  test("floatDot equals sequential left-fold of double products") {
    for (_ <- 1 to 200) {
      val n = 1 + rng.nextInt(80)
      val a = Array.fill(n)(rng.nextFloat() * 2 - 1)
      val b = Array.fill(n)(rng.nextFloat() * 2 - 1)
      val model = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
      val got = Kernels.floatDot(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any)))
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(model), s"n=$n")
    }
  }

  test("floatDot truncates to the shorter vector") {
    val a = new GenericArrayData(Array[Any](1.0f, 2.0f, 3.0f))
    val b = new GenericArrayData(Array[Any](10.0f, 10.0f))
    assert(Kernels.floatDot(a, b) == 30.0)
  }

  test("md5Top60 equals parsing the first 15 hex chars of md5") {
    for (s <- Seq("", "a", "hello", "é中文", "the quick brown fox")) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      val model = java.lang.Long.parseLong(hex.take(15), 16)
      assert(Kernels.md5Top60(s.getBytes("UTF-8")) == model, s"input=$s")
    }
  }

  /** The SQL formulation the oracle runs, in Scala: shingle starts are
    * 1-based 1, 1+stride, ... <= max(len-shingleLen+1, 1), shingles are
    * char substrings of length <= shingleLen. */
  private def modelMinhash(text: String, k: Int, len: Int, stride: Int,
      p: Long): Seq[Long] = {
    val n = text.length // ASCII test inputs: chars == code points
    val hi = math.max(n - len + 1, 1)
    val starts = Iterator.iterate(1)(_ + stride).takeWhile(_ <= hi).toSeq
    val hs = starts.map { i =>
      val sh = text.substring(i - 1, math.min(i - 1 + len, n))
      Kernels.md5Top60(sh.getBytes("UTF-8")) % p
    }
    (0 until k).map { j =>
      hs.map(h => (h * (2 * j + 3) + (7919 * j + 13)) % p).min
    }
  }

  test("minhashSignature equals the naive per-shingle model") {
    val words = Seq("scan", "merge", "row", "table", "query", "x")
    for (_ <- 1 to 100) {
      val text = Seq.fill(1 + rng.nextInt(30))(words(rng.nextInt(words.size))).mkString(" ")
      val got = Kernels.minhashSignature(UTF8String.fromString(text), 16, 8, 2, 2147483647L)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == modelMinhash(text, 16, 8, 2, 2147483647L), s"text=$text")
    }
  }

  test("minhashSignature: identical texts share signatures, distinct texts rarely do") {
    def sig(t: String) = {
      val a = Kernels.minhashSignature(UTF8String.fromString(t), 16, 8, 2, 2147483647L)
      (0 until a.numElements()).map(a.getLong)
    }
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    assert(sig(t1) == sig(t1))
    val t2 = "completely different content with no shared shingles at all here"
    assert(sig(t1).zip(sig(t2)).count { case (x, y) => x == y } < 4)
  }
}
