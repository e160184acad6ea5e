package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions with code generation — these stay inside
  * whole-stage codegen (the generated Java calls the static HashKernels
  * methods), so the fingerprint/simhash hot path pays no iterator or boxing
  * overhead. Preference order per the project brief: native Expression over
  * UDF. */

/** 64-bit content fingerprint of a string (whitespace-normalized, ASCII
  * case-folded rolling hash; see HashKernels.fingerprint64). */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.fingerprint64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(c)
}

/** SimHash signature of a token array (array<string> → long). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash64(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Sequential-fold dot product of two array<double> columns. Bit-identical
  * to aggregate(zip_with(a,b,*), 0.0, +) but one tight loop, no per-row
  * array materialization. */
case class ArrayDot(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotDouble(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.dotDouble($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
    copy(l, r)
}

/** h-permutation MinHash signature of a shingle array, one pass. */
case class MinHashSig(child: Expression, h: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashSig(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhashSig($c, $h)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Random-hyperplane LSH band signatures (array<long>, one per band). */
case class HyperplaneSigs(child: Expression, bitsPerBand: Int, numBands: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.lshSigs(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bitsPerBand, numBands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.lshSigs($c, $bitsPerBand, $numBands)")
  override protected def withNewChildInternal(c: Expression): HyperplaneSigs = copy(child = c)
}

/** Multi-probe LSH probe signatures (array<array<long>>: per band, the
  * exact sig plus flips of the 2^flipBits lowest-margin bit subsets). */
case class HyperplaneProbeSigs(child: Expression, bitsPerBand: Int,
                               numBands: Int, flipBits: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_probe_sigs expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.lshProbeSigs(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      bitsPerBand, numBands, flipBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashKernels.lshProbeSigs($c, $bitsPerBand, $numBands, $flipBits)")
  override protected def withNewChildInternal(c: Expression): HyperplaneProbeSigs =
    copy(child = c)
}

/** Intersection size of two ascending-sorted long arrays (merge walk). */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.intersectSizeSorted(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.intersectSizeSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(l, r)
}

/** Distinct word n-gram shingles of a document, single-pass kernel. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.wordShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.charShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.charShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

/** Generator form of the repetition profile: one (n, top_frac, dup_frac)
  * row per n in [minN, maxN] with at least one n-gram in the document —
  * ONE tokenization pass for the whole range (Catalyst does not CSE
  * repeated scalar kernel calls, so a 9-value profile via 18 scalar
  * columns re-tokenizes 18×; this is the scan-speed form). */
case class RepetitionProfileGen(child: Expression, minN: Int, maxN: Int)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition profile expects STRING, got ${child.dataType.catalogString}")
    else if (minN < 1 || maxN < minN)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bad n range [$minN, $maxN]")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val prof = HashKernels.repetitionProfile(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], minN, maxN)
    (minN to maxN).iterator.flatMap { n =>
      val base = 2 * (n - minN)
      // top_frac == 0 exactly when the doc has fewer than n tokens (a
      // present top gram always has positive char mass)
      if (prof(base) == 0.0) Nil
      else Seq(org.apache.spark.sql.catalyst.InternalRow(
        n, prof(base), prof(base + 1)))
    }
  }

  override protected def withNewChildInternal(c: Expression): RepetitionProfileGen =
    copy(child = c)
}

/** Gopher-style repetition fractions [top_ngram_char_frac,
  * dup_ngram_char_frac] over word n-grams — see
  * HashKernels.repetitionFracs for the exact (oracle-replicated)
  * contract. Row-local, codegen'd: quality filtering at scan speed. */
case class RepetitionFracs(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_fracs expects STRING, got ${child.dataType.catalogString}")
    else if (n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"n-gram size must be >= 1, got $n")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.repetitionFracs(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.repetitionFracs($c, $n)")
  override protected def withNewChildInternal(c: Expression): RepetitionFracs =
    copy(child = c)
}

/** Unicode normalization pre-pass (NFC + control/zero-width strip +
  * whitespace collapse) — see HashKernels.normalizeText for the exact
  * oracle-replicated contract. Row-local, codegen'd. */
/** Unicode-script classification counts of the text in one pass:
  * [latin, cyrillic, han, arabic, devanagari, greek, hangul, kana, digit,
  * space, total] (see HashKernels.scriptCountsOf for bucket contracts). */
case class ScriptCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"script_counts expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.scriptCountsOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.scriptCountsOf($c)")
  override protected def withNewChildInternal(c: Expression): ScriptCounts =
    copy(child = c)
}

/** Winnowing (MOSS) fingerprint hashes of the text — array of the distinct
  * sliding-window minima over md5-60bit code-point k-gram hashes (see
  * HashKernels.winnowFpsOf for the exact selection contract). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.winnowFpsOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.winnowFpsOf($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.normalizeText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.normalizeText($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeText =
    copy(child = c)
}

/** All whitespace tokens of a document (lowercased, non-distinct). */
case class Tokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tokens expects STRING, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.tokensOf(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.tokensOf($c)")
  override protected def withNewChildInternal(c: Expression): Tokens = copy(child = c)
}

/** Table-generating function (UDTF): one output row per word n-gram of the
  * input text, with its position — completes the custom-UDx triple
  * (scalar Expression, Aggregator, Generator). Rows: (pos INT, shingle
  * STRING). Non-distinct and position-ordered, unlike WordShingles. */
case class ShingleGenerator(child: Expression, n: Int)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles expects STRING, got ${child.dataType.catalogString}")
    else if (n < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle size must be >= 1, got $n")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // shared kernel with WordShingles (which dedupes on top of it)
    val grams = HashKernels.ngrams(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    grams.iterator.zipWithIndex.map { case (g, i) =>
      org.apache.spark.sql.catalyst.InternalRow(i, g)
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleGenerator =
    copy(child = c)
}

/** Multi-width shingle UDTF: one row per word n-gram for EVERY n in
  * [minN, maxN], in ascending-n blocks — per n, the same strings in the
  * same order as [[ShingleGenerator]], from ONE tokenization pass. Rows:
  * (n INT, shingle STRING) — consumers that don't slice by width project
  * the shingle alone. A unigram+bigram featurizer over this generator
  * scans and tokenizes the corpus once instead of once per width. */
case class ShingleRangeGenerator(child: Expression, minN: Int, maxN: Int)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes() = {
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles expects STRING, got ${child.dataType.catalogString}")
    else if (minN < 1 || maxN < minN)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bad shingle range [$minN, $maxN]")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    HashKernels.ngramRange(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], minN, maxN)
      .iterator.map { case (n, g) =>
        org.apache.spark.sql.catalyst.InternalRow(n, g)
      }
  }

  override protected def withNewChildInternal(c: Expression): ShingleRangeGenerator =
    copy(child = c)
}

object expressions {
  /** Column wrappers (Spark 4: Column ↔ Expression via classic ExpressionUtils). */
  def fingerprint64(c: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(c)))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def array_dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def minhash_sig(c: Column, h: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), h))
  def lsh_sigs(c: Column, bitsPerBand: Int, numBands: Int): Column =
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(c), bitsPerBand, numBands))
  def lsh_probe_sigs(c: Column, bitsPerBand: Int, numBands: Int, flipBits: Int): Column =
    ColumnBridge.column(HyperplaneProbeSigs(ColumnBridge.expression(c),
      bitsPerBand, numBands, flipBits))
  def sorted_intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
  def char_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(c), n))
  def tokens(c: Column): Column =
    ColumnBridge.column(Tokens(ColumnBridge.expression(c)))
  def repetition_fracs(c: Column, n: Int): Column =
    ColumnBridge.column(RepetitionFracs(ColumnBridge.expression(c), n))
  /** Generator column: (n, top_frac, dup_frac) rows for n in [minN, maxN]
    * — one tokenization pass per document. */
  def repetition_rows(c: Column, minN: Int, maxN: Int): Column =
    ColumnBridge.column(RepetitionProfileGen(ColumnBridge.expression(c), minN, maxN))
  def normalize_text(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
  def script_counts(c: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expression(c)))
  /** Generator column: one (pos, shingle) row per NON-distinct word n-gram
    * (use in a select like explode; WordShingles dedupes, this keeps
    * multiplicity). */
  def shingle_rows(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleGenerator(ColumnBridge.expression(c), n))
  /** Generator column: one shingle row per word n-gram for every n in
    * [minN, maxN] — one tokenization pass (see [[ShingleRangeGenerator]]). */
  def shingle_range_rows(c: Column, minN: Int, maxN: Int): Column =
    ColumnBridge.column(ShingleRangeGenerator(ColumnBridge.expression(c), minN, maxN))
}
