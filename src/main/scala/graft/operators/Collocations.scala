package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** PMI collocation mining — exact pointwise-mutual-information scoring of
  * adjacent word pairs (Church & Hanks 1990), the corpus-pipeline step
  * that surfaces multiword expressions ("new york", "machine learning")
  * for tokenizer vocabularies, stopphrase lists, and feature engineering.
  *
  * PMI(a,b) = log2( P(a,b) / (P(a)·P(b)) ) with P(a,b) = c_ab / M over
  * adjacent bigram occurrences and P(a) = c_a / N over token occurrences.
  * `minCount` floors the bigram count first (PMI is notoriously noisy on
  * rare pairs — a hapax bigram of two hapax words maxes the score), then
  * the top-K by (pmi DESC, a, b) is taken.
  *
  * 100 TB design: one tokenization pass feeds BOTH count tables (bigrams
  * via a row-local zip_with slice, unigrams via explode) — each
  * map-side-combines before its shuffle, so shuffle volume is the
  * DISTINCT vocabulary, not the corpus; `minCount` prunes the bigram
  * table before the unigram joins; the two scalar totals ride a 1-row
  * broadcast (the standard PlanGuard-allowlisted shape); top-K is a
  * TakeOrdered, never a global sort.
  */
object Collocations {

  /** (a, b, c_ab, c_a, c_b, pmi) — top `topK` adjacent-pair collocations
    * with c_ab >= minCount, ordered (pmi DESC, a, b), pmi rounded 6dp. */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long,
              topK: Int): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val toks = df.select(TextAnalysis.tokens(col(textCol)).as("w"))
    // adjacent pairs, row-local: zip the array against its own tail
    val bigrams = toks
      .where(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pairCounts = bigrams.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val uniCounts = toks.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    // scalar totals as a single broadcast row
    val totals = uniCounts.agg(sum(col("c_t")).as("n_tokens"))
      .crossJoin(bigrams.agg(count(lit(1)).as("n_bigrams")))
    pairCounts
      .join(uniCounts.select(col("t").as("a"), col("c_t").as("c_a")), "a")
      .join(uniCounts.select(col("t").as("b"), col("c_t").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        round(log2((col("c_ab") / col("n_bigrams")) /
          ((col("c_a") / col("n_tokens")) * (col("c_b") / col("n_tokens")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topK)
  }
}
