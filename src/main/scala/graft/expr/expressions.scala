package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. Keeping the
  * logic in static methods lets `doGenCode` emit a single call so the
  * expressions stay inside whole-stage codegen spans. */
object Kernels {

  /** Longest prefix of `s` whose UTF-8 encoding is at most `maxBytes` bytes,
    * never splitting a multi-byte character.
    *
    * Behavior of the reference's `cut_str_to_bytes`
    * (`cdc_kafka/tracked_tables.py:361-395`), restated over the raw UTF-8
    * bytes Spark already holds in `UTF8String` — no transcoding needed:
    * back up from the byte limit to the previous character start.
    */
  def truncateUtf8(s: UTF8String, maxBytes: Int): UTF8String = {
    if (maxBytes <= 0) return UTF8String.EMPTY_UTF8
    val n = s.numBytes()
    if (n <= maxBytes) return s
    val bytes = s.getBytes
    var cut = maxBytes
    // A continuation byte is 10xxxxxx; walk back to the char's first byte.
    while (cut > 0 && (bytes(cut) & 0xc0) == 0x80) cut -= 1
    UTF8String.fromBytes(bytes, 0, cut)
  }

  /** Decode a CDC `__$update_mask` into the list of changed column names.
    *
    * SQL Server stores the mask as a big-endian unsigned integer where the
    * column with (1-based) capture ordinal `k` occupies bit `k-1` counting
    * from the least-significant bit — i.e. from the END of the byte array.
    * The reference decodes it the same way (`serializers/avro.py:583-589`:
    * bitarray frombytes + reverse ≡ LSB-first from the last byte).
    */
  def maskToNames(mask: Array[Byte], names: ArrayData): ArrayData = {
    val n = mask.length * 8
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val total = names.numElements()
    while (i < n && i < total) {
      val byte = mask(mask.length - 1 - (i >> 3)) & 0xff
      if (((byte >> (i & 7)) & 1) == 1) out.add(names.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Left-to-right double fold of the element-wise product of two float
    * vectors (shorter length wins). Matches DuckDB's list_reduce fold. */
  def floatDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) — equals parsing the first 15 hex chars of
    * the digest, the engine-shared hash H(s) used by the dedup oracle. */
  def md5Top60(bytes: Array[Byte]): Long = md5Top60(bytes, 0, bytes.length)

  /** Range form: hash `len` bytes at `off` without slicing a copy. */
  def md5Top60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** The dual polynomial window hash dd_substring anchors on (r8): two
    * independent Horner folds over the window's code points,
    *   h1 = fold (acc*31 + cp) mod 1e9+7,  h2 = fold (acc*131 + cp),
    * combined as h = h1 * 2^30 + h2 (< 2^60, the ~60-bit key width the
    * md5 formulation had — a single 1e9+7 hash over the ~30M windows of
    * sf0.1 would already birthday-collide, polluting pairs on BOTH
    * engines). DuckDB computes the identical folds over
    * `ascii(substr(text,i,1))` lists — the `text_fingerprint`
    * discipline. */
  val AnchorHashModulus = 1000000007L
  val AnchorBase1 = 31L
  val AnchorBase2 = 131L

  /** Content-defined anchor windows (dd_substring, r7; rolling hash r8):
    * the distinct engine-shared window hashes of every `width`-char
    * window of `text` whose own hash ≡ 0 (mod `m`) — winnowing-style
    * position-independent sampling for exact passage dedup. Semantics
    * identical to the SQL formulation the DuckDB oracle runs (windows at
    * every offset 1..len-width+1, dual Horner fold over the window's
    * code points, keep h % m = 0, DISTINCT per document), but one fused
    * ROLLING pass: each offset costs O(1) — subtract the leaving code
    * point's B^(width-1) term, shift, add the entering one — where the
    * r7 md5 kernel re-digested all `width` chars per offset (64x the
    * byte traffic; the verdict's one intrinsic-cost flag) and the
    * explode formulation before it materialized a text-bearing row per
    * offset. */
  def substringAnchors(text: UTF8String, width: Int, m: Int): ArrayData = {
    val b = text.getBytes
    val nBytes = b.length
    val M = AnchorHashModulus
    val B1 = AnchorBase1
    val B2 = AnchorBase2
    // B^(width-1) mod M — the leaving character's positional weight.
    var pow1 = 1L; var pow2 = 1L
    var p = 0
    while (p < width - 1) { pow1 = pow1 * B1 % M; pow2 = pow2 * B2 % M; p += 1 }
    val win = new Array[Long](width) // circular buffer of window code points
    val out = new java.util.TreeSet[java.lang.Long]()
    var h1 = 0L; var h2 = 0L
    var seen = 0 // code points consumed
    var off = 0
    while (off < nBytes) {
      val first = b(off)
      val nb = UTF8String.numBytesForFirstByte(first)
      if (off + nb > nBytes) { off = nBytes } // malformed tail: stop
      else {
        val cp: Long = (nb match {
          case 1 => first & 0x7f
          case 2 => ((first & 0x1f) << 6) | (b(off + 1) & 0x3f)
          case 3 => ((first & 0x0f) << 12) | ((b(off + 1) & 0x3f) << 6) |
            (b(off + 2) & 0x3f)
          case _ => ((first & 0x07) << 18) | ((b(off + 1) & 0x3f) << 12) |
            ((b(off + 2) & 0x3f) << 6) | (b(off + 3) & 0x3f)
        }).toLong
        off += nb
        if (seen >= width) {
          val leaving = win(seen % width) // slot about to be overwritten
          h1 = ((h1 - leaving * pow1 % M + M) % M * B1 + cp) % M
          h2 = ((h2 - leaving * pow2 % M + M) % M * B2 + cp) % M
        } else {
          h1 = (h1 * B1 + cp) % M
          h2 = (h2 * B2 + cp) % M
        }
        win(seen % width) = cp
        seen += 1
        if (seen >= width) {
          val h = h1 * 1073741824L + h2
          if (h % m == 0) out.add(h)
        }
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Micro-unit quantization shared by both PQ kernels: exactly Spark's
    * `round(double, 0)` (BigDecimal.valueOf + HALF_UP) on x*1000 — the
    * oracle-parity rounding. */
  private def pqQuantize(v: ArrayData, dims: Int): Array[Long] = {
    val n = math.min(v.numElements(), dims)
    val qv = new Array[Long](dims)
    var i = 0
    while (i < n) {
      qv(i) = java.math.BigDecimal.valueOf(v.getFloat(i).toDouble * 1000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    qv
  }

  /** Exact BIGINT squared distance of subvector `s` of `qv` to LCG
    * codebook centroid `c` — the ONE implementation both PQ kernels
    * share (they must stay bit-identical: the oracle runs the literal
    * SQL of this formula). */
  private def pqSubspaceDist(qv: Array[Long], s: Int, c: Int,
      cents: Int, subDim: Int): Long = {
    var acc = 0L
    var d = 0
    while (d < subDim) {
      val cent = (1103515245L * (s * cents * subDim + c * subDim + d) + 12345L) % 2001L - 1000L
      val df = qv(s * subDim + d) - cent
      acc += df * df
      d += 1
    }
    acc
  }

  /** Fused product-quantization encode (r7): [code0..code3, qerr] for a
    * 64-dim float vector against the deterministic LCG codebook —
    * semantics identical to the SQL formulation the DuckDB oracle runs
    * (micro-unit quantize via Spark's ROUND_HALF_UP double rounding,
    * exact BIGINT squared distances, first-minimum tie-break) but one
    * tight integer loop instead of an interpreted 4×16×16 HOF fold per
    * row (the `emb_pq_encode`/`ann_pq_adc_topk` hot stage). */
  def pqEncode(v: ArrayData, subspaces: Int, cents: Int, subDim: Int): ArrayData = {
    val qv = pqQuantize(v, subspaces * subDim)
    val out = new Array[Long](subspaces + 1)
    var qerr = 0L
    var s = 0
    while (s < subspaces) {
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cents) {
        val acc = pqSubspaceDist(qv, s, c, cents, subDim)
        if (acc < best) { best = acc; bestC = c } // strict <: first minimum
        c += 1
      }
      out(s) = bestC.toLong
      qerr += best
      s += 1
    }
    out(subspaces) = qerr
    new GenericArrayData(out)
  }

  /** Fused JL ±1 random projection (r8): sign(j,d) = LCG(j·inDim+d) ≥ 0
    * over the micro-unit quantized vector — one tight integer loop
    * instead of the interpreted outDim×inDim HOF fold (which measured
    * 39 s at sf0.1; this kernel makes `emb_rp_project` scan-speed).
    * Semantics identical to the SQL formulation the DuckDB oracle runs:
    * HALF_UP micro-unit quantize, exact BIGINT ± adds. */
  /** The sign matrix is data-independent — precompute it once per JVM
    * instead of 1024 multiply+mod ops per row in the hot scan loop. */
  private lazy val rpSigns: Array[Boolean] = {
    val s = new Array[Boolean](graft.expr.GraftFunctions.RpOutDim *
      graft.expr.GraftFunctions.RpInDim)
    var i = 0
    while (i < s.length) {
      s(i) = (1103515245L * i + 12345L) % 2001L - 1000L >= 0
      i += 1
    }
    s
  }

  def rpProject(v: ArrayData, outDim: Int, inDim: Int): ArrayData = {
    val qv = pqQuantize(v, inDim)
    val signs = rpSigns
    require(outDim * inDim <= signs.length,
      s"rp_project: sign table sized for ${signs.length} entries")
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      val base = j * inDim
      var d = 0
      while (d < inDim) {
        acc += (if (signs(base + d)) qv(d) else -qv(d))
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Fused word-bigram list (r8): split on single spaces (keeping empty
    * tokens, exactly like `split(text, ' ')` with Java-regex semantics)
    * and join adjacent pairs with one space — byte-for-byte the grams
    * the interpreted `transform(sequence(...), i -> concat(element_at…))`
    * HOF produces (which the DuckDB oracle still runs as the parity
    * proof), in one pass over the string instead of an interpreted
    * lambda per gram. Fewer than two tokens → empty list, matching the
    * HOF spelling's `CASE WHEN size(w) >= 2 … ELSE array()` guard. */
  def wordBigrams(t: UTF8String): ArrayData = {
    val parts = t.split(UTF8String.fromString(" "), -1)
    if (parts.length < 2) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val out = new Array[AnyRef](parts.length - 1)
    var i = 0
    while (i < parts.length - 1) {
      out(i) = UTF8String.concat(parts(i), space, parts(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused hashed uni+bigram feature buckets (`text_quality_model`,
    * r10): the DISTINCT word unigrams + bigrams of `text` (split on a
    * single space, trailing empties kept — `split(text, ' ')`
    * semantics), each hashed into [0, buckets) with the engine-shared
    * md5 top-60 hash. Semantics identical to the
    * `transform(array_distinct(concat(ws, word_bigrams(text))), g -> H(g) % B)`
    * spelling the DuckDB oracle runs — fused because that HOF pays an
    * interpreted md5 lambda per gram (~2M calls at sf0.1, the dominant
    * cost of the learned-classifier featurize). */
  def featBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val parts = text.split(UTF8String.fromString(" "), -1)
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < parts.length) { seen.add(parts(i)); i += 1 }
    i = 0
    while (i < parts.length - 1) {
      seen.add(UTF8String.concat(parts(i), space, parts(i + 1)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = md5Top60(it.next().getBytes) % buckets
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Fused ADC-table build (r7): the query side of [[pqEncode]] — the
    * flattened `subspaces × cents` table of exact BIGINT squared
    * distances from the vector's micro-unit form to every codebook
    * centroid. Entry (s, c) sits at index s*cents + c (0-based);
    * `element_at(adc, s*cents + p)` with a 1-based in-subspace position
    * p is the candidate-score lookup. */
  def pqAdcTable(v: ArrayData, subspaces: Int, cents: Int, subDim: Int): ArrayData = {
    val qv = pqQuantize(v, subspaces * subDim)
    val out = new Array[Long](subspaces * cents)
    var s = 0
    while (s < subspaces) {
      var c = 0
      while (c < cents) {
        out(s * cents + c) = pqSubspaceDist(qv, s, c, cents, subDim)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** TRAINED-codebook twin of [[pqSubspaceDist]] (r8): centroid (s,c,d)
    * reads from a flat micro-unit codebook (layout
    * `s*cents*subDim + c*subDim + d`, [[graft.tools.KMeansTrainer
    * .trainPqCodebooks]]' output) instead of the LCG formula. Distances
    * stay exact BIGINT — trained centroids are themselves micro-units. */
  private def pqSubspaceDistCb(cb: Array[Long], qv: Array[Long], s: Int,
      c: Int, cents: Int, subDim: Int): Long = {
    var acc = 0L
    var d = 0
    val base = s * cents * subDim + c * subDim
    while (d < subDim) {
      val df = qv(s * subDim + d) - cb(base + d)
      acc += df * df
      d += 1
    }
    acc
  }

  /** [[pqEncode]] against a trained codebook — same quantize, same
    * strict-< first-minimum tie-break, same [code0..code3, qerr]. */
  def pqEncodeCb(cb: Array[Long], v: ArrayData, subspaces: Int,
      cents: Int, subDim: Int): ArrayData = {
    val qv = pqQuantize(v, subspaces * subDim)
    val out = new Array[Long](subspaces + 1)
    var qerr = 0L
    var s = 0
    while (s < subspaces) {
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cents) {
        val acc = pqSubspaceDistCb(cb, qv, s, c, cents, subDim)
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      out(s) = bestC.toLong
      qerr += best
      s += 1
    }
    out(subspaces) = qerr
    new GenericArrayData(out)
  }

  /** [[pqAdcTable]] against a trained codebook. */
  def pqAdcTableCb(cb: Array[Long], v: ArrayData, subspaces: Int,
      cents: Int, subDim: Int): ArrayData = {
    val qv = pqQuantize(v, subspaces * subDim)
    val out = new Array[Long](subspaces * cents)
    var s = 0
    while (s < subspaces) {
      var c = 0
      while (c < cents) {
        out(s * cents + c) = pqSubspaceDistCb(cb, qv, s, c, cents, subDim)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Single-pass MinHash signature over char shingles.
    *
    * Semantics identical to the SQL formulation the DuckDB oracle runs
    * (shingle starts 1, 1+stride, ... <= max(len-shingleLen+1, 1); each
    * shingle = substring(text, i, shingleLen); hash j of shingle h =
    * ((h % p) * (2j+3) + (7919j+13)) % p; signature = per-j minimum) but
    * one fused pass: no shingle array, no per-element Expression eval, a
    * thread-local digest (MessageDigest.getInstance contends across
    * threads — the interpreted version got SLOWER with more cores). */
  def minhashSignature(text: UTF8String, k: Int, shingleLen: Int,
      stride: Int, p: Long): ArrayData = {
    val n = text.numChars()
    val hi = math.max(n - shingleLen + 1, 1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 1
    while (i <= hi) {
      val shingle = text.substringSQL(i, shingleLen)
      val h = md5Top60(shingle.getBytes) % p
      var j = 0
      while (j < k) {
        val v = (h * (2 * j + 3) + (7919 * j + 13)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += stride
    }
    new GenericArrayData(mins)
  }

  /** Precomputed LCG hyperplane table for [[hyperplaneBucket]]: plane j,
    * dim d (0-based) = (((1103515245*(j*64+d) + 12345) % 2001) - 1000) / 1000. */
  private val HyperPlanes: Array[Double] = Array.tabulate(8 * 64) { i =>
    (((1103515245L * i + 12345L) % 2001L) - 1000L) / 1000.0
  }

  /** 8-bit random-hyperplane LSH bucket of a float vector: bit j is set
    * when the dot product with pseudo-random plane j is positive. One fused
    * pass replacing the interpreted `aggregate(transform(sequence(...)))`
    * formulation, which allocated the 64-element plane array per row per
    * plane and evaluated outside whole-stage codegen (round-1 verdict: 26%
    * of total bench time). Accumulation is a left-to-right double fold so
    * the result is bit-identical to the SQL/DuckDB formulation. */
  def hyperplaneBucket(v: ArrayData): Int = {
    val n = v.numElements()
    var bucket = 0
    var j = 0
    while (j < 8) {
      val base = j * 64
      var acc = 0.0
      var d = 0
      while (d < n) {
        val idx = base + d
        val plane =
          if (idx < HyperPlanes.length) HyperPlanes(idx)
          else (((1103515245L * idx + 12345L) % 2001L) - 1000L) / 1000.0
        acc += v.getFloat(d).toDouble * plane
        d += 1
      }
      if (acc > 0.0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  /** Canonicalize text for normalized exact dedup: Unicode lowercase, then
    * collapse runs of ASCII spaces to one. Byte-level single pass over the
    * lowered UTF-8 (continuation bytes are >= 0x80, so a 0x20 byte is
    * always a real space char); replaces `regexp_replace(lower(text),
    * ' +', ' ')`, which paid a JVM regex over every document (round-1
    * verdict: 11 s vs 0.9 s for the non-normalized variant). */
  def normalizeText(s: UTF8String): UTF8String = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var prevSpace = false
    while (i < n) {
      val b = bytes(i)
      if (b == 0x20) {
        if (!prevSpace) { out(o) = b; o += 1 }
        prevSpace = true
      } else {
        out(o) = b; o += 1
        prevSpace = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  def maskBitSet(mask: Array[Byte], ordinal: Int): Boolean = {
    val i = ordinal
    if (i < 0 || i >= mask.length * 8) false
    else ((mask(mask.length - 1 - (i >> 3)) >> (i & 7)) & 1) == 1
  }

  /** Byte permutation that makes unsigned-lexicographic comparison of the
    * result equal SQL Server's `uniqueidentifier` ordering (node bytes
    * 10-15 most significant, then 8-9, then 7..0 reversed) — behavior of
    * `cdc_kafka/validation.py:19-41`. Input is the canonical hyphenated
    * string form; output 16 bytes. */
  def sqlServerUuidSortKey(uuid: UTF8String): Array[Byte] = {
    val hex = uuid.toString.replace("-", "")
    require(hex.length == 32, s"not a UUID: $uuid")
    val b = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      b(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    val order = SqlServerUuidByteOrder
    val out = new Array[Byte](16)
    i = 0
    while (i < 16) { out(i) = b(order(i)); i += 1 }
    out
  }

  val SqlServerUuidByteOrder: Array[Int] =
    Array(10, 11, 12, 13, 14, 15, 8, 9, 7, 6, 5, 4, 3, 2, 1, 0)

  /** Deterministic name-based UUID (RFC 4122 version 3, md5) over `name`
    * within the namespace derived from `seed`: the digest is
    * `md5(md5_hex(seed) ++ name)` with version/variant nibbles patched.
    *
    * Spec'd replacement for the reference's PK-less row key
    * (`cdc_kafka/tracked_tables.py:417-426`): the reference hashes
    * `str(zip(names, values))` which is a *process-local object repr* and
    * therefore not deterministic across runs; we keep its shape
    * (md5-derived namespace + name-based UUID of the row) but hash a
    * deterministic serialization instead. The namespace enters as its
    * lowercase hex rendering (not raw digest bytes) so the whole recipe
    * stays in the string domain and is expressible in ANSI SQL engines
    * for independent verification. */
  def rowUuid(seed: UTF8String, name: UTF8String): UTF8String = {
    val md5 = md5Local.get()
    md5.reset()
    val nsBytes = md5.digest(seed.getBytes)
    val nsHex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      val v = nsBytes(j) & 0xff
      nsHex(2 * j) = Character.forDigit(v >> 4, 16).toByte
      nsHex(2 * j + 1) = Character.forDigit(v & 0xf, 16).toByte
      j += 1
    }
    md5.reset()
    md5.update(nsHex)
    md5.update(name.getBytes)
    val b = md5.digest()
    b(6) = ((b(6) & 0x0f) | 0x30).toByte // version 3 (md5 name-based)
    b(8) = ((b(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      val v = b(i) & 0xff
      sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `truncateUtf8(str, maxBytes)` — UTF-8-boundary-safe byte-limit
  * truncation (SURVEY §2 B6). Codegen-capable: emits a static call. */
case class TruncateUtf8(child: Expression, maxBytes: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = maxBytes
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(str: Any, max: Any): Any =
    Kernels.truncateUtf8(str.asInstanceOf[UTF8String], max.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, m) => s"graft.expr.Kernels.truncateUtf8($s, $m)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, maxBytes = r)
}

/** `maskToNames(mask, namesArrayLiteral)` — CDC update-mask bitmap →
  * array of changed column names (SURVEY §2 F3). */
case class MaskToNames(mask: Expression, names: Expression)
    extends BinaryExpression {
  override def left: Expression = mask
  override def right: Expression = names
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(m: Any, n: Any): Any =
    Kernels.maskToNames(m.asInstanceOf[Array[Byte]], n.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, n) => s"graft.expr.Kernels.maskToNames($m, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(mask = l, names = r)
}

/** `sqlServerUuidSortKey(uuidString)` — 16-byte key whose unsigned binary
  * ordering equals SQL Server `uniqueidentifier` ordering (SURVEY §2 F6). */
case class SqlServerUuidSortKey(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(v: Any): Any =
    Kernels.sqlServerUuidSortKey(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.Kernels.sqlServerUuidSortKey($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `row_uuid(seedString, nameString)` — deterministic name-based UUID for
  * PK-less row keys (SURVEY §2 B7). */
case class RowUuid(seed: Expression, name: Expression)
    extends BinaryExpression {
  override def left: Expression = seed
  override def right: Expression = name
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(s: Any, n: Any): Any =
    Kernels.rowUuid(s.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.expr.Kernels.rowUuid($s, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(seed = l, name = r)
}

/** Column-level entry points for the custom expressions. */
object functions {
  import org.apache.spark.sql.functions.{lit, array}

  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  /** UTF-8-boundary truncation to `maxBytes` bytes (B6). */
  def truncate_utf8(c: Column, maxBytes: Int): Column =
    col(TruncateUtf8(expr(c), expr(lit(maxBytes))))

  /** Update-mask bitmap → changed column names, `names` in capture-ordinal
    * order (F3). */
  def mask_to_names(mask: Column, names: Seq[String]): Column =
    col(MaskToNames(expr(mask), expr(array(names.map(lit): _*))))

  /** SQL-Server-ordered UUID sort key (F6). */
  def sqlserver_uuid_sort_key(uuid: Column): Column =
    col(SqlServerUuidSortKey(expr(uuid)))

  /** Deterministic md5-based UUID of `name` in the md5(seed) namespace (B7). */
  def row_uuid(seed: Column, name: Column): Column =
    col(RowUuid(expr(seed), expr(name)))

  /** `0x`-prefixed lowercase hex rendering of a binary column (F1). */
  def lsn_hex(c: Column): Column = {
    import org.apache.spark.sql.functions._
    concat(lit("0x"), lower(hex(c)))
  }

  /** Parse `0x`-prefixed hex back to binary (F1). */
  def lsn_unhex(c: Column): Column = {
    import org.apache.spark.sql.functions._
    unhex(substring(c, 3, 20))
  }
}

/** `float_dot(a, b)` — dot product of two float vectors as a left-to-right
  * double fold. A custom codegen'd Expression instead of
  * `aggregate(zip_with(...))` because higher-order functions evaluate
  * interpreted (lambda per element, no whole-stage codegen) — on a 64-dim
  * embedding join this expression is ~an-order-of-magnitude cheaper and
  * allocates nothing per row. Fold order matches the DuckDB oracle's
  * `list_reduce` exactly, so floats agree bit-for-bit. */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.floatDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.Kernels.floatDot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `minhash_signature(text)` — fused shingle→MinHash signature (see
  * [[Kernels.minhashSignature]]); parameters are plan-time constants. */
case class MinhashSignature(child: Expression, k: Int, shingleLen: Int,
    stride: Int, p: Long) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.minhashSignature(v.asInstanceOf[UTF8String], k, shingleLen, stride, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.minhashSignature($s, $k, $shingleLen, $stride, ${p}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_encode(vec)` — fused PQ codes + quantization error (see
  * [[Kernels.pqEncode]]). */
case class PqEncode(child: Expression, subspaces: Int, cents: Int, subDim: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.pqEncode(v.asInstanceOf[ArrayData], subspaces, cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.pqEncode($s, $subspaces, $cents, $subDim)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `word_bigrams(text)` — fused adjacent word-pair list (see
  * [[Kernels.wordBigrams]]). */
case class WordBigrams(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.wordBigrams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.Kernels.wordBigrams($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `feat_buckets(text, buckets)` — fused hashed uni+bigram feature
  * buckets (see [[Kernels.featBuckets]]). */
case class FeatBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.featBuckets(v.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.Kernels.featBuckets($s, $buckets)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rp_project(vec)` — fused JL ±1 random projection (see
  * [[Kernels.rpProject]]). */
case class RpProject(child: Expression, outDim: Int, inDim: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.rpProject(v.asInstanceOf[ArrayData], outDim, inDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.rpProject($s, $outDim, $inDim)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_adc_table(vec)` — fused flattened ADC distance table (see
  * [[Kernels.pqAdcTable]]). */
case class PqAdcTable(child: Expression, subspaces: Int, cents: Int, subDim: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.pqAdcTable(v.asInstanceOf[ArrayData], subspaces, cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.pqAdcTable($s, $subspaces, $cents, $subDim)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `PqEncodeTrained(vec)` — [[Kernels.pqEncodeCb]] over a TRAINED flat
  * micro-unit codebook carried as a reference object (1 KiB for the
  * 4×16×16 default — rides the serialized plan like a tiny broadcast;
  * codegen resolves it once per task, not per row). Constructed
  * directly as a [[Column]] (companion) by the AnnIndex trained-build
  * path — not SQL-registered: the codebook is per-index state, not
  * session state. */
case class PqEncodeTrained(child: Expression, codebook: Array[Long],
    subspaces: Int, cents: Int, subDim: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.pqEncodeCb(codebook, v.asInstanceOf[ArrayData], subspaces, cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.pqEncodeCb($cb, $s, $subspaces, $cents, $subDim)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqEncodeTrained {
  def apply(c: Column, cb: Array[Long], subspaces: Int, cents: Int,
      subDim: Int): Column =
    Bridge.column(PqEncodeTrained(Bridge.expression(c), cb, subspaces, cents, subDim))
}

/** `PqAdcTableTrained(vec)` — [[Kernels.pqAdcTableCb]], the query-side
  * twin of [[PqEncodeTrained]] over the same trained codebook. */
case class PqAdcTableTrained(child: Expression, codebook: Array[Long],
    subspaces: Int, cents: Int, subDim: Int) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.pqAdcTableCb(codebook, v.asInstanceOf[ArrayData], subspaces, cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.pqAdcTableCb($cb, $s, $subspaces, $cents, $subDim)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqAdcTableTrained {
  def apply(c: Column, cb: Array[Long], subspaces: Int, cents: Int,
      subDim: Int): Column =
    Bridge.column(PqAdcTableTrained(Bridge.expression(c), cb, subspaces, cents, subDim))
}

/** `substring_anchors(text)` — fused content-defined anchor-window
  * hashes (see [[Kernels.substringAnchors]]). */
case class SubstringAnchors(child: Expression, width: Int, m: Int)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    Kernels.substringAnchors(v.asInstanceOf[UTF8String], width, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expr.Kernels.substringAnchors($s, $width, $m)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `hyperplane_bucket(vec)` — fused 8-plane LSH bucket id (see
  * [[Kernels.hyperplaneBucket]]). */
case class HyperplaneBucket(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    Kernels.hyperplaneBucket(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.Kernels.hyperplaneBucket($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `normalize_text(str)` — lowercase + space-run collapse (see
  * [[Kernels.normalizeText]]). */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    Kernels.normalizeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expr.Kernels.normalizeText($s)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `bloom_might_contain(str)` over a broadcast sketch [[org.apache.spark
  * .util.sketch.BloomFilter]] — the decontamination prefilter
  * (`pipe_decontaminate_bloom`) as a codegen'd expression instead of a
  * Scala-closure UDF, so the one stage that touches EVERY corpus row
  * stays inside whole-stage codegen. Semantics are identical to the UDF
  * it replaced UNDER FILTER evaluation (`mightContainString` on the same
  * sketch → bit-identical candidate set; the exact verify downstream is
  * unchanged either way). One divergence outside filters: the UDF mapped
  * NULL input to `false`, while this null-intolerant expression yields
  * NULL — the same rows pass a WHERE, but a projection or negation over
  * NULL inputs differs. Wrap in `coalesce(..., false)` for such uses.
  * The expression carries only the small broadcast HANDLE; executors
  * resolve it to the (potentially GB-sized) filter locally. */
case class BloomMightContainString(child: Expression,
    filter: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any =
    filter.value.mightContainString(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloomBroadcast", filter,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, s =>
      s"((org.apache.spark.util.sketch.BloomFilter) $b.value())" +
        s".mightContainString($s.toString())")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomMightContainString {
  def apply(c: Column,
      filter: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    Bridge.column(BloomMightContainString(Bridge.expression(c), filter))
}

/** Session-level SQL registration for the custom expressions, so
  * `spark.sql` text can use them alongside built-ins. */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  val MinhashK = 16
  val ShingleLen = 8
  val ShingleStride = 2
  val MinhashP = 2147483647L
  val AnchorWidth = 64
  val AnchorModulus = 16
  val PqSubspaces = 4
  val PqCentroids = 16
  val PqSubDim = 16
  val RpOutDim = 16
  val RpInDim = 64
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "minhash_signature",
      args => MinhashSignature(args(0), MinhashK, ShingleLen, ShingleStride, MinhashP))
    Bridge.registerFunction(spark, "substring_anchors",
      args => SubstringAnchors(args(0), AnchorWidth, AnchorModulus))
    Bridge.registerFunction(spark, "pq_encode",
      args => PqEncode(args(0), PqSubspaces, PqCentroids, PqSubDim))
    Bridge.registerFunction(spark, "pq_adc_table",
      args => PqAdcTable(args(0), PqSubspaces, PqCentroids, PqSubDim))
    Bridge.registerFunction(spark, "rp_project",
      args => RpProject(args(0), RpOutDim, RpInDim))
    Bridge.registerFunction(spark, "word_bigrams",
      args => WordBigrams(args(0)))
    Bridge.registerFunction(spark, "feat_buckets",
      args => {
        require(args.length == 2 && args(1).foldable,
          "feat_buckets(text, buckets): buckets must be a literal")
        val b = args(1).eval() match {
          case i: Int => i
          case l: Long if l == l.toInt => l.toInt
          case other => throw new IllegalArgumentException(
            s"feat_buckets: buckets must be an Int-range integer literal, got $other")
        }
        FeatBuckets(args(0), b)
      })
    Bridge.registerFunction(spark, "float_dot",
      args => FloatDotProduct(args(0), args(1)))
    Bridge.registerFunction(spark, "truncate_utf8",
      args => TruncateUtf8(args(0), args(1)))
    Bridge.registerFunction(spark, "mask_to_names",
      args => MaskToNames(args(0), args(1)))
    Bridge.registerFunction(spark, "sqlserver_uuid_sort_key",
      args => SqlServerUuidSortKey(args(0)))
    Bridge.registerFunction(spark, "row_uuid",
      args => RowUuid(args(0), args(1)))
    Bridge.registerFunction(spark, "hyperplane_bucket",
      args => HyperplaneBucket(args(0)))
    Bridge.registerFunction(spark, "normalize_text",
      args => NormalizeText(args(0)))
    Bridge.registerFunction(spark, "kmv_bottomk",
      args => {
        require(args.length == 2 && args(1).foldable,
          "kmv_bottomk(hash, k): k must be a literal")
        val k = args(1).eval() match {
          case i: Int => i
          case l: Long if l == l.toInt => l.toInt
          case other => throw new IllegalArgumentException(
            s"kmv_bottomk: k must be an Int-range integer literal, got $other")
        }
        KmvBottomK(args(0), k)
      })
    Bridge.registerFunction(spark, "bottomk_sample",
      args => {
        require(args.length == 3 && args(2).foldable,
          "bottomk_sample(hash, value, k): k must be a literal")
        val k = args(2).eval() match {
          case i: Int => i
          case l: Long if l == l.toInt => l.toInt
          case other => throw new IllegalArgumentException(
            s"bottomk_sample: k must be an Int-range integer literal, got $other")
        }
        BottomKSample(args(0), args(1), k)
      })
    Bridge.registerFunction(spark, "mg_candidates",
      args => {
        require(args.length == 2 && args(1).foldable,
          "mg_candidates(item, k): k must be a literal")
        val k = args(1).eval() match {
          case i: Int => i
          case l: Long if l == l.toInt => l.toInt
          case other => throw new IllegalArgumentException(
            s"mg_candidates: k must be an Int-range integer literal, got $other")
        }
        MisraGriesCandidates(args(0), k)
      })
  }
}
