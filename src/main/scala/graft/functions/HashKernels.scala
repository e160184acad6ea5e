package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash kernels used by the fingerprinting / SimHash
  * expressions. Static methods so generated code (doGenCode) can call them
  * directly and stay inside whole-stage codegen.
  *
  * Self-contained (FNV-1a over UTF-8 bytes + murmur-style finalizer) — no
  * dependence on Spark-internal hash classes, stable across Spark versions.
  */
object HashKernels {

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** 64-bit FNV-1a with avalanche finalizer over a byte range. */
  def fnv1a64(bytes: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    fmix64(h)
  }

  /** murmur3 finalizer: avalanches FNV's weak low bits. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Content fingerprint of a document: polynomial rolling hash over the
    * whitespace-normalized, lowercased text — a deterministic 64-bit
    * document identity for exact dedup at scale (hash-groupBy instead of
    * grouping by full text). Whitespace runs collapse to a single space;
    * leading/trailing whitespace ignored; ASCII uppercase folded. */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      if (isWs) {
        if (emitted) pendingSpace = true
      } else {
        if (pendingSpace) { h ^= ' '.toLong; h *= FnvPrime; pendingSpace = false }
        val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        h ^= (lower & 0xffL)
        h *= FnvPrime
        emitted = true
      }
      i += 1
    }
    fmix64(h)
  }

  /** SimHash over an array of token strings: per-token 64-bit hash votes on
    * each bit; the sign of each bit's vote sum forms the signature. Standard
    * Charikar construction; near-duplicate docs land within small Hamming
    * distance. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t)
        val b = tok.getBytes
        val h = fnv1a64(b, 0, b.length, 0L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Seeded string hash for MinHash permutations. */
  def seededHash64(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    fnv1a64(b, 0, b.length, seed)
  }

  /** MinHash signature: h seeded min-hashes over a shingle array in ONE pass
    * (each shingle's bytes are hashed once; the h permutation variants are
    * derived by mixing the base hash with per-permutation constants). The
    * composed-builtin formulation (h × array_min(transform(...))) costs h
    * array traversals and a huge codegen tree; this is the custom-Expression
    * path the project brief prefers for hot loops. */
  def minhashSig(shingles: ArrayData, h: Int): ArrayData = {
    val mins = new Array[Long](h)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val b = shingles.getUTF8String(i).getBytes
        val base = fnv1a64(b, 0, b.length, 0L)
        var k = 0
        while (k < h) {
          val v = fmix64(base ^ (0x9e3779b97f4a7c15L * (k + 1)))
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Sequential-fold dot product of two double arrays — bit-identical to
    * aggregate(zip_with(...)) and to DuckDB's list_dot_product, without the
    * per-row array allocations of the HOF formulation. */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Random-hyperplane LSH band signatures in one pass: for each of
    * `numBands` bands, `bitsPerBand` sign bits of dots with deterministic
    * pseudo-random planes. Plane matrices are cached per shape. */
  def lshSigs(vec: ArrayData, bitsPerBand: Int, numBands: Int): ArrayData = {
    val dim = vec.numElements()
    val nPlanes = bitsPerBand * numBands
    val planes = planeCache.computeIfAbsent((nPlanes, dim),
      _ => Array.tabulate(nPlanes * dim)(idx => planeComponent(idx / dim, idx % dim)))
    val sigs = new Array[Long](numBands)
    var p = 0
    while (p < bitsPerBand * numBands) {
      var dot = 0.0
      var j = 0
      val off = p * dim
      while (j < dim) { dot += vec.getDouble(j) * planes(off + j); j += 1 }
      if (dot >= 0) sigs(p / bitsPerBand) |= 1L << (p % bitsPerBand)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  /** Multi-probe LSH probe signatures: per band, the exact signature PLUS
    * every signature reachable by flipping subsets of the `flipBits`
    * lowest-margin bits (margin = |plane dot| — the bits most likely to
    * disagree with a true neighbor, Lv et al. VLDB'07), 2^flipBits probe
    * sigs per band. Flip-bit selection orders by (|dot| ascending, plane
    * index ascending) — exactly the SQL replica's ORDER BY abs(dot),
    * plane, so gate and oracle probe identical buckets. Same plane cache
    * and ascending-index dot fold as [[lshSigs]] (bit-identical sign and
    * margin values). Output: array of numBands inner arrays, each of
    * 2^flipBits probe sigs. */
  def lshProbeSigs(vec: ArrayData, bitsPerBand: Int, numBands: Int,
                   flipBits: Int): ArrayData = {
    // flipBits > bitsPerBand would exhaust the not-taken set (best = -1 →
    // AIOOBE at taken(best)); flipBits >= 31 overflows `1 << flipBits`.
    // The SQL oracle under the same misconfiguration silently emits NULL
    // probe sigs (dropped candidates) — so fail loud and early here, on
    // the side that runs first. By-name message: zero cost when valid.
    require(flipBits >= 0 && flipBits <= bitsPerBand && flipBits < 31,
      s"flipBits $flipBits must be in [0, min(bitsPerBand=$bitsPerBand, 30)]")
    val dim = vec.numElements()
    val nPlanes = bitsPerBand * numBands
    val planes = planeCache.computeIfAbsent((nPlanes, dim),
      _ => Array.tabulate(nPlanes * dim)(idx => planeComponent(idx / dim, idx % dim)))
    val dots = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      val off = p * dim
      while (j < dim) { dot += vec.getDouble(j) * planes(off + j); j += 1 }
      dots(p) = dot
      p += 1
    }
    val nProbes = 1 << flipBits
    val out = new Array[AnyRef](numBands)
    var band = 0
    while (band < numBands) {
      var sig = 0L
      var b = 0
      while (b < bitsPerBand) {
        if (dots(band * bitsPerBand + b) >= 0) sig |= 1L << b
        b += 1
      }
      // flipBits smallest (|dot|, bit) selections via partial selection
      // (bitsPerBand is tiny; an insertion pass is cheaper than sorting)
      val flips = new Array[Int](flipBits)
      val taken = new Array[Boolean](bitsPerBand)
      var f = 0
      while (f < flipBits) {
        var best = -1
        var bestAbs = Double.MaxValue
        var i = 0
        while (i < bitsPerBand) {
          if (!taken(i)) {
            val a = math.abs(dots(band * bitsPerBand + i))
            if (a < bestAbs) { bestAbs = a; best = i }
          }
          i += 1
        }
        taken(best) = true
        flips(f) = best
        f += 1
      }
      val probes = new Array[Long](nProbes)
      var m = 0
      while (m < nProbes) {
        var s = sig
        var fb = 0
        while (fb < flipBits) {
          if ((m & (1 << fb)) != 0) s ^= 1L << flips(fb)
          fb += 1
        }
        probes(m) = s
        m += 1
      }
      out(band) = new org.apache.spark.sql.catalyst.util.GenericArrayData(probes)
      band += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Deterministic pseudo-random plane component in [-1, 1). */
  def planeComponent(plane: Int, dim: Int): Double = {
    val h = fmix64(plane.toLong * 0x9e3779b97f4a7c15L + dim * 0xbf58476d1ce4e5b9L + 42L)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Distinct word n-gram shingles in one pass: lowercase, split on ASCII
    * whitespace (Java regex \s semantics: space \t \n \x0B \f \r), join n
    * consecutive tokens with single spaces, first-occurrence-order distinct.
    * Equivalent to the composed-builtin form
    * array_distinct(transform(sequence..., concat_ws(element_at(tokens...))))
    * — which re-tokenizes the document for every element_at lambda because
    * Catalyst does not CSE inside lambda functions (measured ~50× slower). */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val grams = ngrams(s, n)
    val out = new java.util.LinkedHashSet[UTF8String]()
    grams.foreach(out.add)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Position-ordered (non-distinct) word n-grams — the shared kernel under
    * both WordShingles (which dedupes) and the ShingleGenerator UDTF. */
  def ngrams(s: UTF8String, n: Int): Array[UTF8String] = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val text = s.toLowerCase.toString
    val tokens = new java.util.ArrayList[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens.add(text.substring(start, i))
    }
    val nTok = tokens.size()
    val count = math.max(0, nTok - n + 1)
    val out = new Array[UTF8String](count)
    var t = 0
    while (t < count) {
      val sb = new java.lang.StringBuilder(tokens.get(t))
      var d = 1
      while (d < n) { sb.append(' ').append(tokens.get(t + d)); d += 1 }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    out
  }

  /** All word n-grams for every n in [minN, maxN], ONE tokenization pass —
    * per n, the emitted strings (and their order) are exactly
    * [[ngrams]](s, n); grams are concatenated in ascending-n blocks. The
    * single-pass form exists because a multi-width featurizer (unigram +
    * bigram hashing) otherwise tokenizes the corpus once per width. */
  def ngramRange(s: UTF8String, minN: Int,
                 maxN: Int): Array[(Int, UTF8String)] = {
    require(minN >= 1 && maxN >= minN, s"bad n-gram range [$minN, $maxN]")
    val text = s.toLowerCase.toString
    val tokens = new java.util.ArrayList[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens.add(text.substring(start, i))
    }
    val nTok = tokens.size()
    var total = 0
    var n = minN
    while (n <= maxN) { total += math.max(0, nTok - n + 1); n = n + 1 }
    val out = new Array[(Int, UTF8String)](total)
    var o = 0
    n = minN
    while (n <= maxN) {
      val count = math.max(0, nTok - n + 1)
      var t = 0
      while (t < count) {
        val sb = new java.lang.StringBuilder(tokens.get(t))
        var d = 1
        while (d < n) { sb.append(' ').append(tokens.get(t + d)); d += 1 }
        out(o) = (n, UTF8String.fromString(sb.toString))
        o += 1; t += 1
      }
      n += 1
    }
    out
  }

  /** Distinct character n-grams (codepoint windows, first-occurrence
    * order) of the lowercased, whitespace-normalized text: all whitespace
    * runs — leading, trailing, internal — collapse to at most one ' ';
    * leading/trailing whitespace is dropped entirely. One normalization
    * pass per STRING, not per window (the Column-level HOF form this
    * replaces re-ran the regexp normalization inside the transform lambda
    * once per character position — no CSE inside lambdas). */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val text = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (isWs(c)) { if (sb.length > 0 && sb.charAt(sb.length - 1) != ' ') sb.append(' ') }
      else sb.append(c)
      i += 1
    }
    while (sb.length > 0 && sb.charAt(sb.length - 1) == ' ')
      sb.setLength(sb.length - 1)
    val cps = sb.toString.codePoints().toArray
    val count = cps.length - n + 1
    val out = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p < count) {
      out.add(UTF8String.fromString(new String(cps, p, n)))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Intersection size of two ASCENDING-sorted long arrays by merge walk —
    * no hash-set build, no result-array materialization (array_intersect
    * does both). Callers guarantee sortedness (sort_array at plan level)
    * and element distinctness. */
  def intersectSizeSorted(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** All whitespace tokens (lowercased, empties dropped), duplicates kept —
    * same token definition as wordShingles but non-distinct. Kernel form of
    * filter(split(lower(trim(text)), "\\s+"), length > 0). */
  def tokensOf(s: UTF8String): ArrayData = {
    val text = s.toLowerCase.toString
    val tokens = new java.util.ArrayList[AnyRef](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) tokens.add(UTF8String.fromString(text.substring(start, i)))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      tokens.toArray(new Array[AnyRef](tokens.size())))
  }

  /** Gopher-style within-document repetition fractions over word n-grams
    * (Rae et al. 2021, "Scaling Language Models", table A1): returns
    * [top_frac, dup_frac] where, over the NON-distinct word n-grams of the
    * document (same token/gram definition as ngrams above),
    *
    *   top_frac = count(g*) * chars(g*) / chars(normalized text)
    *              for g* the most frequent n-gram (ties broken by smallest
    *              UTF-8 byte order — the oracle's binary-collation ORDER BY),
    *   dup_frac = min(1, sum over grams with count >= 2 of
    *              count(g) * chars(g)) / chars(normalized text)
    *
    * chars() counts Unicode code points; "normalized text" is the
    * single-space join of the tokens. Gram character mass double-counts
    * overlapping occurrences — hence the clamp — which is the documented,
    * oracle-replicable contract (exact interval-union coverage is not
    * SQL-expressible). Both fractions are 0.0 when the document has fewer
    * than n tokens. Row-local: one gram pass + one small hash map. */
  def repetitionFracs(s: UTF8String, n: Int): ArrayData = {
    val p = repetitionProfile(s, n, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](p(0), p(1)))
  }

  /** Multi-n repetition profile in ONE tokenization pass: returns
    * [top_minN, dup_minN, top_{minN+1}, dup_{minN+1}, ...] — the kernel
    * under both RepetitionFracs (single n) and the RepetitionProfileGen
    * generator (n range per row without re-tokenizing; Catalyst does not
    * CSE repeated scalar calls, so the generator form is what keeps a
    * 9-value quality profile at scan speed). Entries for n > token count
    * are 0.0 (the generator omits those rows entirely). */
  def repetitionProfile(s: UTF8String, minN: Int, maxN: Int): Array[Double] = {
    require(minN >= 1 && maxN >= minN, s"bad n range [$minN, $maxN]")
    val text = s.toLowerCase.toString
    val toks = new java.util.ArrayList[String](64)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(text.charAt(i))) i += 1
      if (i > start) toks.add(text.substring(start, i))
    }
    val nTok = toks.size()
    var nc = math.max(0, nTok - 1) // separator spaces
    var ti = 0
    while (ti < nTok) {
      val t = toks.get(ti)
      nc += t.codePointCount(0, t.length)
      ti += 1
    }
    val out = new Array[Double](2 * (maxN - minN + 1))
    var n = minN
    while (n <= maxN) {
      val count = nTok - n + 1
      if (count >= 1 && nc > 0) {
        val counts = new java.util.HashMap[String, Int](count * 2)
        var t = 0
        while (t < count) {
          val sb = new java.lang.StringBuilder(toks.get(t))
          var d = 1
          while (d < n) { sb.append(' ').append(toks.get(t + d)); d += 1 }
          counts.merge(sb.toString, 1, (a, b) => a + b)
          t += 1
        }
        var topGram: String = null
        var topCount = 0
        var dupMass = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val g = e.getKey
          val c = e.getValue
          if (c > topCount || (c == topCount && cpLt(g, topGram))) {
            topGram = g; topCount = c
          }
          if (c >= 2) dupMass += c.toLong * g.codePointCount(0, g.length)
        }
        val base = 2 * (n - minN)
        out(base) = topCount.toDouble *
          topGram.codePointCount(0, topGram.length) / nc
        out(base + 1) = math.min(1.0, dupMass.toDouble / nc)
      }
      n += 1
    }
    out
  }

  /** Unicode text normalization — the standard corpus-ingest pre-pass:
    * 1. NFC canonical composition (java.text.Normalizer; DuckDB's
    *    nfc_normalize implements the same Unicode algorithm),
    * 2. strip C0 controls (minus the whitespace ones), DEL, and the
    *    zero-width set U+200B..U+200D, U+FEFF,
    * 3. collapse whitespace runs ([ \t\n\x0B\f\r]) to single spaces and
    *    trim.
    * Every step is replicated verbatim in the SQL oracle (explicit
    * character classes — no engine-specific \p{...} semantics). */
  def normalizeText(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val isCtl = (c < 0x20 && !isWs(c)) || c == 0x7f ||
        (c >= 0x200b && c <= 0x200d) || c == 0xfeff
      if (!isCtl) {
        if (isWs(c)) { if (started) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          started = true
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Code-point-order less-than — identical to UTF-8 byte order (UTF-8
    * preserves code point order), i.e. the oracle's binary VARCHAR
    * collation; NOT Java's UTF-16 compareTo, which misorders
    * supplementary-plane characters against [U+E000, U+FFFF]. */
  private def cpLt(a: String, b: String): Boolean = {
    if (b == null) return true
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** Unicode-script classification counts in ONE code-point pass:
    * [latin, cyrillic, han, arabic, devanagari, greek, hangul, kana,
    * digit, space, total]. Bucket definitions are exactly the regex
    * classes the oracle uses — \p{IsX} == Character.UnicodeScript.X,
    * kana = Hiragana|Katakana, digit = [0-9], space = Java \s
    * ([ \t\n\x0B\f\r]); ASCII digits/whitespace are script COMMON, so the
    * buckets never overlap and each equals its standalone regex count.
    * Replaces 11 full regexp_replace passes per document (linear but
    * 10x the constant factor at bench scale). */
  def scriptCountsOf(s: UTF8String): ArrayData = {
    import java.lang.Character.UnicodeScript
    val t = s.toString
    val counts = new Array[Long](11)
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      counts(10) += 1
      if (cp >= '0' && cp <= '9') counts(8) += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b ||
               cp == '\f' || cp == '\r') counts(9) += 1
      else UnicodeScript.of(cp) match {
        case UnicodeScript.LATIN      => counts(0) += 1
        case UnicodeScript.CYRILLIC   => counts(1) += 1
        case UnicodeScript.HAN        => counts(2) += 1
        case UnicodeScript.ARABIC     => counts(3) += 1
        case UnicodeScript.DEVANAGARI => counts(4) += 1
        case UnicodeScript.GREEK      => counts(5) += 1
        case UnicodeScript.HANGUL     => counts(6) += 1
        case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => counts(7) += 1
        case _ => ()
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, MOSS) as
    * one row-local pass: code-point k-grams of lower(trim(text)), each
    * hashed to the LOW 60 BITS OF MD5 (== `conv(substring(md5(g),1,15),
    * 16,10)` — 15 hex digits are the top 60 bits of the first 8 digest
    * bytes), sliding-window minima over `w` consecutive hashes (window
    * starts 1..max(1, n-w+1); the last window truncates at the array end,
    * so docs with fewer than w k-grams keep one whole-doc window), then
    * first-occurrence-ordered distinct. A pure-Column formulation of the
    * same math exists but is optimizer-fragile: CollapseProject inlines
    * the gram-array alias into the per-window lambda and re-hashes the
    * whole document once per window (measured 290x overcompute at 10x
    * bench scale). */
  def winnowFpsOf(s: UTF8String, k: Int, w: Int): ArrayData = {
    // UTF-8 bytes of lower(trim(text)); k-grams are code-point slices, so
    // record each code point's byte offset once (UTF-8 lead bytes) and md5
    // byte ranges directly — no per-gram String/byte[] allocation.
    val bytes = s.trim().toLowerCase.getBytes
    val nBytes = bytes.length
    var nCp = 0
    var b = 0
    while (b < nBytes) { if ((bytes(b) & 0xc0) != 0x80) nCp += 1; b += 1 }
    val n = nCp - (k - 1)
    if (n < 1)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nCp + 1)
    var c = 0
    b = 0
    while (b < nBytes) { if ((bytes(b) & 0xc0) != 0x80) { starts(c) = b; c += 1 }; b += 1 }
    starts(c) = nBytes
    val md = md5Local.get()
    val hashes = new Array[Long](n)
    var p = 0
    while (p < n) {
      md.reset()
      md.update(bytes, starts(p), starts(p + k) - starts(p))
      val d = md.digest()
      hashes(p) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      p += 1
    }
    val out = new java.util.LinkedHashSet[AnyRef]()
    val nw = math.max(1, n - w + 1)
    var st = 0
    while (st < nw) {
      var m = hashes(st)
      var q = st + 1
      val end = math.min(st + w, n)
      while (q < end) { if (hashes(q) < m) m = hashes(q); q += 1 }
      out.add(java.lang.Long.valueOf(m))
      st += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }
}
