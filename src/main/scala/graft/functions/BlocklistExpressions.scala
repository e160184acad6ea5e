package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions over the Aho-Corasick blocklist kernel
  * ([[AcAutomaton]]). The automaton is built once per executor JVM (per
  * pattern list — see `AcAutomaton.forPatterns`) and referenced from the
  * generated code via `addReferenceObj`, the same shape Spark's own
  * `RegExpExtract` uses for its compiled Pattern: matching stays inside
  * whole-stage codegen, one automaton instance shared by every task. */
private[functions] trait AcExpression extends UnaryExpression {
  def patterns: Seq[String]
  @transient protected lazy val ac: AcAutomaton = AcAutomaton.forPatterns(patterns)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got ${child.dataType.catalogString}")
    else if (patterns.isEmpty || patterns.exists(p => p == null || p.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a non-empty list of non-empty patterns")
    else if (patterns.distinct.length != patterns.length) {
      // reject at ANALYSIS time: letting a duplicate reach the automaton
      // constructor would fail mid-job on an executor instead
      val dup = patterns.diff(patterns.distinct).distinct.head
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName pattern list contains duplicate '$dup'")
    } else TypeCheckResult.TypeCheckSuccess
  }
  protected def genViaAutomaton(ctx: CodegenContext, ev: ExprCode,
                                method: String): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.$method($c)")
  }
}

/** Distinct matched blocklist patterns in the text, in pattern-list order
  * (array<string>); one Aho-Corasick pass, O(|text| + matches). */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
  extends AcExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ac.matchedPatterns(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genViaAutomaton(ctx, ev, "matchedPatterns")
  override protected def withNewChildInternal(c: Expression): MultiPatternMatches =
    copy(child = c)
}

/** True iff ANY blocklist pattern occurs — early-exits at the first hit,
  * the cheap screen for filter-clean pipelines. */
case class AnyPatternMatch(child: Expression, patterns: Seq[String])
  extends AcExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    ac.anyMatch(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genViaAutomaton(ctx, ev, "anyMatch")
  override protected def withNewChildInternal(c: Expression): AnyPatternMatch =
    copy(child = c)
}

/** Total pattern-occurrence count (overlapping occurrences counted). */
case class PatternOccurrenceCount(child: Expression, patterns: Seq[String])
  extends AcExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ac.countOccurrences(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genViaAutomaton(ctx, ev, "countOccurrences")
  override protected def withNewChildInternal(c: Expression): PatternOccurrenceCount =
    copy(child = c)
}

object BlocklistExpressions {
  def multi_pattern_matches(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternMatches(ColumnBridge.expression(c), patterns))
  def any_pattern_match(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(AnyPatternMatch(ColumnBridge.expression(c), patterns))
  def pattern_occurrence_count(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(PatternOccurrenceCount(ColumnBridge.expression(c), patterns))
}
