package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel — the record-linkage string metric
  * (Winkler 1990): Jaro similarity (match window ⌊max/2⌋-1,
  * half-transposition counting) plus the common-prefix boost
  * jw = jaro + min(prefix,4)·0.1·(1-jaro). Complements the edit-distance
  * PassJoin tier: JW is length-normalized and front-weighted — the right
  * metric for names/titles, where Levenshtein thresholds misbehave across
  * very different lengths.
  *
  * Operates on Unicode CODE POINTS (surrogate pairs are one symbol) —
  * matches DuckDB's `jaro_winkler_similarity` (pinned by the oracle gate
  * on real data and by textbook vectors in the spec). */
object JaroWinklerKernel {

  // per-thread scratch for the match flags — the kernel runs inside tight
  // codegen loops over millions of candidate pairs; allocating four
  // arrays per call dominated the cost (measured 3x end-to-end)
  private val scratch = new ThreadLocal[(Array[Boolean], Array[Boolean])] {
    override def initialValue() = (new Array[Boolean](64), new Array[Boolean](64))
  }
  private def flags(na: Int, nb: Int): (Array[Boolean], Array[Boolean]) = {
    var (fa, fb) = scratch.get()
    if (fa.length < na || fb.length < nb) {
      fa = new Array[Boolean](math.max(na, fa.length * 2))
      fb = new Array[Boolean](math.max(nb, fb.length * 2))
      scratch.set((fa, fb))
    } else {
      java.util.Arrays.fill(fa, 0, na, false)
      java.util.Arrays.fill(fb, 0, nb, false)
    }
    (fa, fb)
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val na = a.numBytes()
    val nb = b.numBytes()
    // ASCII fast path: bytes ARE the symbols — no String/code-point
    // materialization, no per-call allocation
    if (a.numChars() == na && b.numChars() == nb)
      jaroWinklerAscii(a, b)
    else {
      val s = a.toString.codePoints().toArray
      val t = b.toString.codePoints().toArray
      jaroWinklerGeneric(s, t)
    }
  }

  private def jaroWinklerAscii(a: UTF8String, b: UTF8String): Double = {
    val ls = a.numBytes()
    val lt = b.numBytes()
    if (ls == 0 && lt == 0) return 1.0
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val (sMatch, tMatch) = flags(ls, lt)
    var matches = 0
    var i = 0
    while (i < ls) {
      val ci = a.getByte(i)
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && ci == b.getByte(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var j = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(j)) j += 1
        if (a.getByte(i) != b.getByte(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / ls + m / lt + (m - trans / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(math.min(ls, lt), 4) &&
           a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def jaroWinklerGeneric(s: Array[Int], t: Array[Int]): Double = {
    if (s.length == 0 && t.length == 0) return 1.0
    if (s.length == 0 || t.length == 0) return 0.0
    val window = math.max(math.max(s.length, t.length) / 2 - 1, 0)
    val sMatch = new Array[Boolean](s.length)
    val tMatch = new Array[Boolean](t.length)
    var matches = 0
    var i = 0
    while (i < s.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(t.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched symbols out of order, counted in halves
    var trans = 0
    var j = 0
    i = 0
    while (i < s.length) {
      if (sMatch(i)) {
        while (!tMatch(j)) j += 1
        if (s(i) != t(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / s.length + m / t.length + (m - trans / 2.0) / m) / 3.0
    // Winkler's boost THRESHOLD: the prefix bonus only applies when the
    // Jaro score already exceeds 0.7 (the original 1990 rule — also what
    // DuckDB implements; without it, weak pairs with a shared prefix get
    // inflated past real matches)
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(math.min(s.length, t.length), 4) &&
           s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object SoundexKernel {
  // American Soundex digit classes; 0 = vowel/ignored (a e i o u y w h)
  private val code: Array[Byte] = {
    val c = new Array[Byte](26)
    "bfpv".foreach(ch => c(ch - 'a') = 1)
    "cgjkqsxz".foreach(ch => c(ch - 'a') = 2)
    "dt".foreach(ch => c(ch - 'a') = 3)
    c('l' - 'a') = 4
    "mn".foreach(ch => c(ch - 'a') = 5)
    c('r' - 'a') = 6
    c
  }

  /** American Soundex (the census rules): first letter + 3 digits;
    * doubled/adjacent same-class letters collapse, H and W are
    * transparent between consonants of the same class, vowels break the
    * run. Non-ASCII-letter leading characters yield "" (callers treat it
    * as its own block). The classic phonetic BLOCKING key for
    * [[graft.operators.FuzzyJoin]] — "Robert" and "Rupert" share R163. */
  def soundex(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    // find first ASCII letter
    var first: Int = -1
    while (i < n && first < 0) {
      val b = s.getByte(i) | 0x20
      if (b >= 'a' && b <= 'z') first = b
      else i += 1
    }
    if (first < 0) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](4)
    out(0) = (first - 32).toByte // uppercase
    var len = 1
    var lastCode = code(first - 'a')
    i += 1
    while (i < n && len < 4) {
      val b = s.getByte(i) | 0x20
      if (b >= 'a' && b <= 'z') {
        val c = code(b - 'a')
        if (c != 0 && c != lastCode) {
          out(len) = ('0' + c).toByte
          len += 1
        }
        // vowels reset the run; h/w are transparent (keep lastCode)
        if (b != 'h' && b != 'w') lastCode = c
      } else lastCode = 0 // non-letters break runs like vowels
      i += 1
    }
    while (len < 4) { out(len) = '0'; len += 1 }
    UTF8String.fromBytes(out)
  }
}

/** Codegen expression: soundex4(s) → 4-char American Soundex code. */
case class Soundex4(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"soundex4 expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    SoundexKernel.soundex(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SoundexKernel.soundex($c)")
  override protected def withNewChildInternal(c: Expression): Soundex4 = copy(c)
}

/** Codegen expression: jaro_winkler(a, b) → double. */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerKernel.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
                                                 r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

object JaroWinklerSim {
  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSim(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
