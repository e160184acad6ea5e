package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BlocklistExpressions._

/** Substring-level blocklist screening — the complement of the token-level
  * [[Blocklist]]: match every document against a phrase blocklist as RAW
  * SUBSTRINGS (case-sensitive, tokenizer-independent — catches
  * "bad.word", "badword", mid-token hits that token matching can't see) in
  * ONE text pass via the Aho-Corasick kernel
  * ([[graft.functions.AcAutomaton]]).
  *
  * Why not `contains` per pattern: the naive plan (an OR-chain or a cross
  * join against a pattern table) re-scans each document once per pattern —
  * O(|text|·|P|). The automaton makes the screen O(|text| + matches), so a
  * 10k-phrase blocklist costs the same scan as a 1-phrase one.
  *
  * 100 TB design: entirely row-local — patterns ride in the task closure
  * (a few MB even at 100k phrases), ONE automaton instance per executor
  * JVM (per-JVM cache keyed by the pattern list), text never shuffles, and
  * every expression is codegen'd (`addReferenceObj`, the RegExpExtract
  * shape). `filterClean`'s early-exit `anyMatch` screen pushes down the
  * scan like any other filter.
  */
object SubstringBlocklist {

  /** Adds `matched` (distinct patterns present, pattern-list order) and
    * `n_matched`. */
  def annotate(df: DataFrame, textCol: String,
               patterns: Seq[String]): DataFrame =
    df.withColumn("matched", multi_pattern_matches(col(textCol), patterns))
      .withColumn("n_matched", size(col("matched")))

  /** (idCol, pattern) pair per document × matched pattern — the exploded,
    * fully-scalar audit view. */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
                 patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        explode(multi_pattern_matches(col(textCol), patterns)).as("pattern"))

  /** Documents with zero blocklist hits — the early-exit screen. */
  def filterClean(df: DataFrame, textCol: String,
                  patterns: Seq[String]): DataFrame =
    df.where(!any_pattern_match(col(textCol), patterns))

  /** Adds `n_occurrences`: total (overlapping) occurrence count, the
    * severity signal quality filters threshold on. */
  def withOccurrenceCount(df: DataFrame, textCol: String,
                          patterns: Seq[String]): DataFrame =
    df.withColumn("n_occurrences",
      pattern_occurrence_count(col(textCol), patterns))
}
