package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Unigram language-model surprisal — the cheap stand-in for the LM
  * perplexity filter every web-corpus pipeline runs (CCNet-style): train
  * unigram frequencies on the corpus itself, score each document by its
  * mean per-token surprisal -mean(log2 p(tok)). Gibberish and rare-token
  * floods score high; plain prose scores low.
  *
  * Model: vocabulary = the `maxVocab` most frequent tokens (ties toward
  * the lexicographically smaller token — deterministic and replicable in
  * SQL); out-of-vocabulary tokens take a floor count of 1. p(tok) =
  * count / total over ALL token occurrences.
  *
  * Scale: training is one token-count aggregate (8-byte-ish rows) plus a
  * distributed top-K (orderBy+limit = per-partition top-K); scoring joins
  * the token stream against the BROADCAST vocabulary and partial-aggregates
  * per doc — the text itself never shuffles, and the single-row total is a
  * broadcast scalar (same bounded-size pattern as tf-idf's doc count). */
object UnigramLM {

  /** Output: one row per doc with n_tokens and surprisal (bits/token,
    * rounded to 4 decimals; docs with no tokens get surprisal 0). */
  def surprisal(df: DataFrame, idCol: String, textCol: String,
                maxVocab: Int = 65536): DataFrame = {
    require(maxVocab >= 1)
    val toks = df.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(col(textCol))).as("__tok"))
    val counts = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum(col("__cnt")).as("__total"))
    val vocab = counts.orderBy(col("__cnt").desc, col("__tok")).limit(maxVocab)
    val scored = toks
      .join(broadcast(vocab), Seq("__tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("__id"),
        (-log2(coalesce(col("__cnt"), lit(1L)) / col("__total"))).as("__s"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("__s")), 4).as("surprisal"))
    df.select(col(idCol)).join(scored, df(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("surprisal"), lit(0.0)).as("surprisal"))
  }
}
