package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths of the hash expressions. One tight JVM
  * loop per row; no Catalyst dispatch per element.
  */
object HashKernels {

  def ngramShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out =
      if (toks.length <= n) Array(toks.mkString(" "))
      else {
        val m = toks.length - n + 1
        val arr = new Array[String](m)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          arr(i) = sb.toString
          i += 1
        }
        arr
      }
    new GenericArrayData(out.map(UTF8String.fromString))
  }

  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Karp-Rabin polynomial rolling hash over code points:
    * acc = (acc*31 + cp) mod 2^31-1. Matches DuckDB
    * `list_reduce(list_prepend(0::BIGINT, [ascii(s[i]) ...]), (a,b) -> (a*31+b) % 2147483647)`.
    */
  def rollingHash(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  // ---- Mersenne-61 modular arithmetic for the window rolling hash.
  // p = 2^61-1 keeps products reducible with one multiplyHigh: for
  // a,b < p the 122-bit product hi·2^64 + lo reduces via 2^61 ≡ 1
  // (so 2^64 ≡ 8) to (hi·8 + lo₆₃₋₆₁) + lo₆₀₋₀ < 2^62, then one more
  // fold. Fixed 61-bit base; strong enough that structured text cannot
  // collide by construction (unlike mod-2^64 polynomial hashes, whose
  // ±1-character difference patterns cancel on Thue–Morse-like input).
  private final val M61 = (1L << 61) - 1
  private final val WinBase = 0x2545F4914F6CDD1DL & M61

  private def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & M61)
    r = (r & M61) + (r >>> 61)
    if (r >= M61) r - M61 else r
  }

  /** All overlapping `minLen`-code-point window hashes of `text`, one
    * per 1-based start position `1 .. numChars-minLen+1` (empty array
    * below `minLen` chars): Karp–Rabin polynomial rolling hash over
    * code points mod 2^61-1. The O(n) substitute for enumerating
    * `xxhash64(substr(text, pos, minLen))` per position — same window
    * partitioning w.h.p. (collision expectation reaches ~1 only near
    * √p ≈ 1.5·10⁹ distinct windows; a collision over-marks, never
    * misses), at 1/minLen the hash work and zero per-window substring
    * copies. Positions count CODE POINTS — the unit Spark's
    * `substr`/`length` and DuckDB's `substring` agree on — so spans
    * derived from these positions splice correctly in either engine.
    */
  def windowHashes(text: UTF8String, minLen: Int): ArrayData = {
    val s = text.toString
    val nChars = s.codePointCount(0, s.length)
    if (nChars < minLen) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](nChars)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val m = nChars - minLen + 1
    val out = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < minLen) {
      h = mulMod61(h, WinBase) + cps(j)
      if (h >= M61) h -= M61
      j += 1
    }
    out(0) = h
    // pw = base^(minLen-1): the weight of the window's leading char
    var pw = 1L
    j = 0
    while (j < minLen - 1) { pw = mulMod61(pw, WinBase); j += 1 }
    var p = 1
    while (p < m) {
      h = h - mulMod61(cps(p - 1), pw)
      if (h < 0) h += M61
      h = mulMod61(h, WinBase) + cps(p + minLen - 1)
      if (h >= M61) h -= M61
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** md5-based MinHash signature: for each permutation j < k, the
    * minimum 16-hex-char prefix of md5("j:" + shingle) over all
    * shingles — byte-identical to the SQL
    * `list_min(list_transform(grams, g -> substr(md5(j || ':' || g),1,16)))`
    * formulation, so the oracle can reproduce it, at kernel speed.
    */
  def md5MinhashSig(arr: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    var j = 0
    while (j < k) {
      val prefix = (j.toString + ":").getBytes("UTF-8")
      var best: String = null
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          md.reset()
          md.update(prefix)
          md.update(arr.getUTF8String(i).getBytes)
          val digest = md.digest()
          val sb = new java.lang.StringBuilder(16)
          var b = 0
          while (b < 8) {
            sb.append(Character.forDigit((digest(b) >> 4) & 0xf, 16))
            sb.append(Character.forDigit(digest(b) & 0xf, 16))
            b += 1
          }
          val hex = sb.toString
          if (best == null || hex.compareTo(best) < 0) best = hex
        }
        i += 1
      }
      mins(j) = best
      j += 1
    }
    new GenericArrayData(mins.map(s => if (s == null) null else UTF8String.fromString(s)))
  }

  /** md5-based SimHash, emitted as a 16-hex-char string: per shingle,
    * md5's top 64 bits vote ±1 per bit position; a bit is set when its
    * vote sum is positive. Byte-identical to the SQL formulation over
    * `substr(md5(g), 1, 16)` nibbles (hex char j/4, nibble bit 3-(j%4)
    * ≡ digest byte j>>3, bit 7-(j&7)), so the DuckDB oracle reproduces
    * it exactly — at kernel speed instead of a |shingles|×64 explode.
    */
  def md5SimhashHex(arr: ArrayData): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          if (((digest(j >> 3) >> (7 - (j & 7))) & 1) == 1) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(16)
    var nib = 0
    while (nib < 16) {
      var nv = 0
      var b = 0
      while (b < 4) {
        if (acc(nib * 4 + b) > 0) nv |= 1 << (3 - b)
        b += 1
      }
      sb.append(Character.forDigit(nv, 16))
      nib += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Winnowing-style fingerprint: minimum md5-hex prefix (16 chars)
    * over all `window`-char substrings. Matches the SQL HOF form
    * `list_min([substr(md5(s[i:i+w-1]),1,16) ...])` — MessageDigest md5
    * of the UTF-8 bytes equals the SQL md5 of the substring. Returns
    * null (None) when the text is shorter than the window.
    */
  def winnowMin(text: UTF8String, window: Int): UTF8String = {
    // windows are counted in CODE POINTS, not UTF-16 units — the SQL
    // oracle slices characters, and a surrogate pair (emoji) would
    // otherwise shift every window boundary after it
    val s = text.toString
    val cps = s.codePoints().toArray
    if (cps.length < window) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
    var i = 0
    val last = cps.length - window
    while (i <= last) {
      md.reset()
      val digest = md.digest(new String(cps, i, window).getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(16)
      var j = 0
      while (j < 8) { // 8 bytes = 16 hex chars
        sb.append(Character.forDigit((digest(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(digest(j) & 0xf, 16))
        j += 1
      }
      val hex = sb.toString
      if (best == null || hex.compareTo(best) < 0) best = hex
      i += 1
    }
    UTF8String.fromString(best)
  }

  /** Sequential-fold dot product over two array<double> columns —
    * bit-identical to the zip_with+aggregate HOF form and to DuckDB's
    * list_dot_product (same left-to-right summation order).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def rhpBucket(arr: ArrayData, nbits: Int, table: Int): Long = {
    val n = arr.numElements()
    var bucket = 0L
    var b = 0
    while (b < nbits) {
      val globalBit = table * nbits + b
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong(i.toLong, globalBit.toLong)
        val comp = java.lang.Math.floorMod(h, 1000000L).toDouble / 500000.0 - 1.0
        proj += arr.getDouble(i) * comp
        i += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Squared L2 norm of an array<double> — the fused form of
    * `dot(a, a)`: one array traversal and one element load per term
    * instead of two. Accumulation order matches `dot` exactly
    * (sequential s += v*v), so results are bit-identical and the
    * [[graft.functions.SelfDotRewrite]] optimizer rule is semantics-free.
    */
  def norm2sq(arr: ArrayData): Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = arr.getDouble(i); s += v * v; i += 1 }
    s
  }

  /** 2-D Hilbert curve index (the classic xy2d walk): maps a
    * (x, y) cell in the 2^bits × 2^bits grid to its position along the
    * Hilbert curve. Unlike the Morton/Z curve, consecutive positions are
    * ALWAYS grid-adjacent (no diagonal jumps across half the space), so
    * contiguous curve ranges = tighter spatial tiles = better file
    * min/max locality for box queries.
    */
  /** Gopher-style repetition statistics (Rae et al. '21 §A1.1) in ONE
    * pass per n: for n = 2..4 the character fraction covered by the most
    * frequent word n-gram (count × gram chars ÷ text chars; ties break
    * to the lexicographically smallest gram so the stat is deterministic
    * and DuckDB-oracle-able), and the duplicate-gram fraction
    * 1 − distinct/total. Returns a 6-double struct row:
    * (top2, top3, top4, dup2, dup3, dup4). Tokenization matches
    * `split(text, ' ')` everywhere else in the corpus surface; fewer
    * than n tokens → both stats 0 for that n.
    */
  /** Code-point comparison: identical to UTF-8 byte order, which is
    * DuckDB's binary VARCHAR collation — plain String.compareTo is
    * UTF-16 unit order and diverges on supplementary-plane text.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val toks = s.split(" ", -1)
    // character counts are CODE POINTS (DuckDB length()), not UTF-16 units
    val chars = s.codePointCount(0, s.length).toDouble
    val out = new Array[Any](6)
    var n = 2
    while (n <= 4) {
      val total = toks.length - n + 1
      if (total <= 0 || chars == 0.0) {
        out(n - 2) = 0.0
        out(n + 1) = 0.0
      } else {
        val counts = new java.util.HashMap[String, Integer](total * 2)
        var maxCnt = 0
        var best: String = null
        var i = 0
        while (i < total) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          val g = sb.toString
          val c = counts.merge(g, 1, (a, b) => a + b).intValue()
          if (c > maxCnt || (c == maxCnt && cpCompare(g, best) < 0)) {
            maxCnt = c; best = g
          }
          i += 1
        }
        out(n - 2) = maxCnt * best.codePointCount(0, best.length) / chars
        out(n + 1) = 1.0 - counts.size.toDouble / total
      }
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  def hilbertIndex(bits: Int, xIn: Int, yIn: Int): Long = {
    // out-of-range bits silently degenerate via Java shift wraparound
    // (bits=33 → s wraps to a 2×2 walk; bits=0 → every cell maps to 0),
    // so validate here — this also covers the SQL surface
    require(bits >= 1 && bits <= 31, s"hilbert bits must be in [1, 31], got $bits")
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** n-dimensional Hilbert index (Skilling, "Programming the Hilbert
    * curve", AIP CP 707, 2004 — the transpose-form algorithm): maps n
    * coordinates of `bits` bits each to a single scalar in
    * [0, 2^(n·bits)). Generalizes [[hilbertIndex]] beyond 2-D (vertex
    * orientation differs from the 2-D kernel's convention; both are
    * Hilbert-family curves — consecutive indexes step exactly ONE
    * coordinate by exactly 1, the locality property layout clustering
    * relies on, proven for both in KernelProperties).
    */
  def hilbertIndexN(bits: Int, coords: ArrayData): Long = {
    val n = coords.numElements()
    require(bits >= 1 && n >= 1 && n * bits <= 62,
      s"hilbert_nd needs bits>=1 and dims*bits<=62, got dims=$n bits=$bits")
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      // getInt on a null slot silently reads 0 — reject it loudly, a
      // missing coordinate must never cluster as coordinate 0
      require(!coords.isNullAt(i), s"hilbert_nd coordinate $i is null")
      val c = coords.getInt(i)
      require(c >= 0 && c < (1L << bits), s"coord $c out of [0, 2^$bits)")
      x(i) = c.toLong
      i += 1
    }
    // Skilling AxestoTranspose: inverse-undo excess work, then Gray encode
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed index: bit j of dim i lands at position
    // j*n + (n-1-i) — dim 0 carries the most significant bit per level
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) { d = (d << 1) | ((x(i) >>> j) & 1L); i += 1 }
      j -= 1
    }
    d
  }
}
