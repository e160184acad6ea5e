package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level statistical quality signals: per-document entropy profiles
  * and per-slice lexical-diversity (distinct-n) metrics — the cheap
  * information-theoretic filters web-corpus pipelines run alongside LM
  * perplexity (low char entropy = repeated-character junk; low type-token
  * ratio on a slice = template/boilerplate floods).
  *
  * Scale: everything here is explode → hash-keyed partial aggregate; the
  * text never shuffles, only (doc, symbol-hash, count) rows do, and the
  * per-doc/per-slice outputs are the sole survivors.
  */
object CorpusStats {

  /** Per-document Shannon entropy over the character and token
    * distributions of the normalized text (`lower(trim(text))`):
    * H = -Σ p·log2(p), p = count/total within the document. Junk detectors:
    * "aaaa…" floods score ≈ 0 bits/char; natural prose sits ~4–4.5
    * bits/char; base64/hex blobs run higher with a flat token profile.
    *
    * Output: (id, n_chars, char_entropy, n_tokens, token_entropy), both
    * entropies rounded to 4 decimals, empty docs → zeros.
    *
    * Scale: symbols shuffle as 8-byte xxhash64 keys with map-side partial
    * counts (exact modulo ~2^-64 collisions); the two aggregates are
    * per-(doc, symbol) then per-doc — no global state at all, so this
    * parallelizes embarrassingly at any corpus size. */
  def entropyProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = df.select(col(idCol).as("__id"),
      lower(trim(col(textCol))).as("__t"))

    def entropyOver(sym: DataFrame, outCnt: String, outEnt: String): DataFrame =
      sym.groupBy(col("__id"), col("__s"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("__id"))
        .agg(sum(col("__c")).as(outCnt),
          // H = log2(total) - sum(c*log2(c))/total  (one pass, no second
          // join against the per-doc total)
          round(log2(sum(col("__c"))) -
            sum(col("__c") * log2(col("__c"))) / sum(col("__c")), 4).as(outEnt))

    val chars = norm.filter(length(col("__t")) > 0)
      .select(col("__id"), explode(split(col("__t"), "")).as("__c0"))
      .select(col("__id"), xxhash64(col("__c0")).as("__s"))
    val toks = norm
      .select(col("__id"), explode(TextAnalysis.tokens(col("__t"))).as("__t0"))
      .select(col("__id"), xxhash64(col("__t0")).as("__s"))

    val ce = entropyOver(chars, "n_chars", "char_entropy")
    val te = entropyOver(toks, "n_tokens", "token_entropy")
    df.select(col(idCol)).join(ce, df(idCol) === ce("__id"), "left")
      .drop("__id")
      .join(te, df(idCol) === te("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("token_entropy"), lit(0.0)).as("token_entropy"))
  }

  /** Per-slice lexical diversity: distinct-n ratios (distinct n-grams /
    * total n-grams, n = 1..3) plus totals, grouped by `sliceCol` — the
    * distinct-n metric used to quantify corpus (or generated-text)
    * diversity; a slice flooded with near-identical documents shows a
    * collapsed distinct-2/distinct-3.
    *
    * Output: (slice, n_tokens, distinct_1, distinct_2, distinct_3,
    * ratio_1, ratio_2, ratio_3), ratios rounded to 6.
    *
    * Scale: n-grams shuffle once as 8-byte hashes per n; distinct counts
    * are partial-aggregated per slice. Slice count is small (sources /
    * shards), so the final aggregate is trivially bounded. */
  def distinctNgramStats(df: DataFrame, sliceCol: String, textCol: String): DataFrame = {
    val base = df.select(col(sliceCol).as("__slice"),
      TextAnalysis.tokens(col(textCol)).as("__w"))

    // positional n-grams WITH multiplicity (wordShingles dedups per doc,
    // which would undercount the totals the ratios divide by)
    def grams(n: Int): DataFrame = {
      val g =
        if (n == 1) col("__w")
        else when(size(col("__w")) >= n,
          transform(sequence(lit(1), size(col("__w")) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(o => element_at(col("__w"), i + lit(o))): _*)))
          .otherwise(array())
      base.select(col("__slice"), explode(g).as("__g0"), lit(n).as("__n"))
        .select(col("__slice"), xxhash64(col("__g0")).as("__g"), col("__n"))
    }

    val all = grams(1).union(grams(2)).union(grams(3))
    val per = all.groupBy(col("__slice"), col("__n"))
      .agg(count(lit(1)).as("__tot"), countDistinct(col("__g")).as("__d"))
    per.groupBy(col("__slice").as("slice"))
      .pivot("__n", Seq(1, 2, 3))
      .agg(first(col("__tot")).as("tot"), first(col("__d")).as("d"))
      .select(col("slice"),
        coalesce(col("1_tot"), lit(0L)).as("n_tokens"),
        coalesce(col("1_d"), lit(0L)).as("distinct_1"),
        coalesce(col("2_d"), lit(0L)).as("distinct_2"),
        coalesce(col("3_d"), lit(0L)).as("distinct_3"),
        round(coalesce(col("1_d") / col("1_tot"), lit(0.0)), 6).as("ratio_1"),
        round(coalesce(col("2_d") / col("2_tot"), lit(0.0)), 6).as("ratio_2"),
        round(coalesce(col("3_d") / col("3_tot"), lit(0.0)), 6).as("ratio_3"))
  }
}
