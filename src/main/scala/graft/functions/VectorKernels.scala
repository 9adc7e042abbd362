package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row kernels invoked from generated code by the custom
  * Catalyst expressions in [[CodegenExpressions]].
  *
  * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`) are
  * CodegenFallback: each element evaluation walks an interpreted expression
  * tree, which measured ~45 µs per 64-dim cosine on the all-pairs bench —
  * the entire cost of q52. These kernels are plain JVM loops over Spark's
  * columnar `ArrayData`, so a pair costs ~100 ns and the expression stays
  * inside whole-stage codegen.
  */
object VectorKernels {

  /** Sequential-fold dot product — identical accumulation order to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so results are
    * bit-identical to the HOF formulation (and to the DuckDB oracle). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  private final val GOLDEN = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — standard bit mixer for deriving a hash family
    * from one base hash. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** Winnowed packed-(hash, pos) fingerprint selection over a token
    * array — the compiled equivalent of the HOF chain in
    * [[graft.operators.Winnowing.fingerprints]]:
    * {{{
    *   vs   = transform(sequence(0, n-k), i =>
    *            conv(substring(md5(concat_ws(" ", slice(toks,i+1,k))),1,10),16,10)
    *              .cast("long") * 2^20 + i)
    *   sels = array_distinct(transform(sequence(0, g-w), s =>
    *            array_min(slice(vs, s+1, w))))
    * }}}
    * Value-identical by construction: the gram bytes are the same
    * concat_ws(" ") join, MD5 is MD5, and the first 10 hex chars of the
    * digest ARE its first 5 bytes read big-endian. What the kernel
    * removes is pure evaluation overhead, not math: the interpreted
    * per-element lambda walks (each array_min(slice(...)) COPIES a
    * w-slice), the hex round-trip (digest → 32-char hex string →
    * substring → conv string parse), and a fresh MessageDigest per gram
    * — the q202 bench row was one ~2.2 s single-stage job that is
    * exactly this expression. Window minima run in O(g) via a monotone
    * deque instead of O(g·w) slice copies.
    *
    * Dedup note: array_distinct keeps first occurrences. A packed value
    * occurs at ONE gram position p (pos lives in the low 20 bits), is
    * eligible for the contiguous window range [p-w+1, p], and once a
    * smaller value enters at a LATER position it also leaves later — so
    * a value's reign as window-min is one contiguous run and duplicates
    * in the minima sequence are always CONSECUTIVE; suppressing
    * consecutive repeats is exactly array_distinct here (property-pinned
    * against the HOF form in WinnowKernelSpec).
    *
    * Callers guard n ≥ k + w − 1 (at least one full window) and the
    * 2^20 pos-packing overflow, same as the HOF form. */
  def winnowPacked(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val g = n - k + 1 // k-gram count
    if (g < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val packed = new Array[Long](g)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < g) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // concat_ws(" ", ...) semantics verbatim (skips nulls, keeps
      // empty strings) — the md5 input bytes must match the HOF form.
      val gram = UTF8String.concatWs(SPACE, parts: _*)
      md.reset()
      val d = md.digest(gram.getBytes)
      val h = ((d(0) & 0xFFL) << 32) | ((d(1) & 0xFFL) << 24) |
        ((d(2) & 0xFFL) << 16) | ((d(3) & 0xFFL) << 8) | (d(4) & 0xFFL)
      packed(i) = h * 1048576L + i // 2^20 pos packing
      i += 1
    }
    // Sliding-window minima via monotone deque (indices of increasing
    // packed values), consecutive-duplicate suppression on emission.
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0
    val out = new Array[Long](g - w + 1)
    var outN = 0
    i = 0
    while (i < g) {
      while (tail > head && packed(deque(tail - 1)) >= packed(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = packed(deque(head))
        if (outN == 0 || out(outN - 1) != m) { out(outN) = m; outN += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  /** 64-bit SimHash of a token array — exact compiled equivalent of the
    * per-bit HOF formulation (bit j votes ±1 by bit j of xxhash64(token),
    * Spark seed 42; fingerprint bit j set iff the vote sum is positive),
    * but one hash + 64 bit-tests per token instead of 64 interpreted
    * passes per document. */
  def simhash(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }

  /** Per-language (code, trigram bytes) profiles, sorted by code —
    * initialized from [[TextFunctions.langProfiles]]. */
  private lazy val langTable: Array[(UTF8String, Array[UTF8String])] =
    TextFunctions.langProfiles.toArray.sortBy(_._1).map { case (lang, grams) =>
      (UTF8String.fromString(lang), grams.map(UTF8String.fromString).toArray)
    }

  /** Char-n-gram language ID — compiled equivalent of the struct/array_max
    * Column formulation: score = count of profile trigrams contained in the
    * lowercased text; argmax with ties to the lexicographically greatest
    * code (array_max on (score, lang) structs orders the same way). */
  def langId(text: UTF8String): UTF8String = {
    val lowered = text.toLowerCase
    var bestLang: UTF8String = null
    var bestScore = -1
    var i = 0
    while (i < langTable.length) {
      val (lang, grams) = langTable(i)
      var score = 0
      var j = 0
      while (j < grams.length) {
        if (lowered.contains(grams(j))) score += 1
        j += 1
      }
      if (score > bestScore || (score == bestScore && lang.compareTo(bestLang) > 0)) {
        bestScore = score
        bestLang = lang
      }
      i += 1
    }
    bestLang
  }

  /** Karp-Rabin rolling fingerprint: (acc*31 + codePoint) mod 1e9+7 over
    * the text's code points — exactly `aggregate(transform(split(text, ""),
    * ascii), 0L, (acc, x) => (acc*31 + x) % 1000000007)` (Java's
    * zero-width split keeps surrogate pairs whole, so code-point iteration
    * matches for all text). */
  def rollingFingerprint(s: UTF8String): Long = {
    var acc = 0L
    val str = s.toString
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Multi-table sign-random-projection LSH bucket ids — compiled
    * equivalent of the HOF formulation in VectorFunctions.lshBuckets with
    * IDENTICAL hashing (Spark XxHash64 fold, seed 42, over the two int
    * inputs), so bucket assignments are unchanged: hyperplane component
    * sign_ij = pmod(xxhash64(table*1024 + j, i), 2)*2 - 1; bit j of table
    * t's bucket set iff Σ_i e_i·sign_ij > 0; bucket tagged t in the high
    * bits. */
  /** Sign-LSH bucket-bit sizing policy: bits must grow ~log N to hold
    * per-bucket occupancy (and with it candidate-pair cost per bucket,
    * ~occupancy²/2) constant as the corpus grows. `ceil` biases toward
    * MORE pruning: uniform buckets land occupancy in (target/2, target].
    * Clamped to [4, 24] — below 4 bits table collisions stop pruning at
    * all (tiny corpora don't need LSH anyway), above 24 (16M buckets per
    * table, occupancy ~60 at N=10^9) the recall cost of further splitting
    * outweighs the pruning, and the id stays inside the 32-bit low field
    * of the table-tagged bucket long. */
  def autoLshBits(n: Long, targetPerBucket: Int = 30): Int = {
    val raw = math.ceil(math.log(math.max(n, 1L).toDouble / targetPerBucket)
      / math.log(2.0)).toInt
    math.min(24, math.max(4, raw))
  }

  def lshBuckets(e: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    val dim = e.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val seedJ = XXH64.hashInt(t * 1024 + j, 42L)
        var proj = 0.0
        var i = 0
        while (i < dim) {
          val h = XXH64.hashInt(i, seedJ)
          val sign = (((h % 2) + 2) % 2) * 2 - 1
          proj += e.getDouble(i) * sign
          i += 1
        }
        if (proj > 0.0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket + (t.toLong << 32)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles from a token array: the compiled
    * equivalent of `array_distinct(transform(sequence(...), i =>
    * concat_ws(" ", toks[i..i+n-1])))`, which measured ~1.7 ms/doc
    * interpreted — first-occurrence order preserved, empty when the doc has
    * fewer than n tokens. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** One-pass MinHash signature: each shingle is xxhash64'd ONCE, then the
    * `numHashes` family members derive by splitmix64 mixing — 1 byte-hash +
    * k mixes per shingle instead of k byte-hashes, all in compiled code.
    * (The previous formulation, 64 separate `transform` passes of
    * `xxhash64(lit(i), s)`, cost 64 interpreted tree-walks per shingle.) */
  def minhash(shingles: ArrayData, numHashes: Int): ArrayData = {
    val acc = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var k = 0
      while (k < numHashes) {
        val h = mix(base + k * GOLDEN)
        if (h < acc(k)) acc(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}
