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

  /** Bigram-LM surprisal: mean −log2 P(w_i | w_{i−1}) per document, with a
    * `<s>` begin-of-document context for the first token — the next step up
    * from the unigram filter (catches right-words-wrong-order text the
    * unigram model scores as fluent). Self-trained on the scored corpus, so
    * every scored bigram was seen at least once and no smoothing is needed:
    * p = c(prev,cur) / c(prev), exactly SQL-replicable.
    *
    * Scale: unlike the unigram vocabulary, the bigram table is NOT
    * broadcastable — counts and scoring join on 8-byte xxhash64 keys of the
    * (prev, cur) pair (exact modulo ~2^-64, the dedup-family equivalence);
    * both joins are plain equi-joins with map-side partial counts, and the
    * per-doc aggregate is the only row that leaves. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__w"))
    val bi = toks.filter(size(col("__w")) > 0)
      .select(col("__id"), col("__w"),
        posexplode(col("__w")).as(Seq("__i", "__cur")))
      .select(col("__id"),
        // posexplode positions are 0-based; element_at is 1-based, so
        // element_at(w, i) IS the previous token for position i >= 1
        when(col("__i") === 0, lit("<s>"))
          .otherwise(element_at(col("__w"), col("__i"))).as("__prev"),
        col("__cur"))
      .select(col("__id"), xxhash64(col("__prev")).as("__ph"),
        // space-joined pair key: tokens are whitespace-split so neither
        // side can contain a space — ("ab","c") can never collide with
        // ("a","bc")
        xxhash64(concat_ws(" ", col("__prev"), col("__cur"))).as("__bh"))
    val bcounts = bi.groupBy(col("__bh")).agg(count(lit(1)).as("__bc"))
    val pcounts = bi.groupBy(col("__ph")).agg(count(lit(1)).as("__pc"))
    val scored = bi
      .join(bcounts, "__bh")
      .join(pcounts, "__ph")
      .select(col("__id"), (-log2(col("__bc") / col("__pc"))).as("__s"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__s")), 4).as("surprisal"))
    df.select(col(idCol)).join(scored, df(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal"), lit(0.0)).as("surprisal"))
  }

  /** Interpolated Kneser–Ney bigram surprisal — the standard smoothed LM
    * the unsmoothed [[bigramSurprisal]] approximates. Absolute discount D
    * is redistributed through the CONTINUATION distribution (how many
    * distinct contexts a word follows), which is what separates boilerplate
    * words that appear everywhere from topical words that appear often but
    * in one context:
    *
    *   P_KN(cur|prev) = max(c(prev,cur)-D, 0)/c(prev)
    *                  + D * N1p(prev,*)/c(prev) * N1p(*,cur)/T
    *
    * with N1p(prev,*) = distinct continuations of prev, N1p(*,cur) =
    * distinct contexts of cur, T = total distinct bigram types. Self-trained
    * on the scored corpus (every scored bigram has c >= 1), `<s>` begin
    * context, mean -log2 P per document rounded to 4 decimals.
    *
    * Scale: identical shuffle shape to [[bigramSurprisal]] — all model
    * tables are keyed by 8-byte xxhash64 of the token/pair (exact modulo
    * ~2^-64), counts partial-aggregate map-side, the text itself never
    * shuffles, and only T rides a single-row broadcast. The continuation
    * table adds one extra distinct-aggregate over bigram TYPES (already a
    * deduplicated, bounded-cardinality table), not over occurrences. */
  def kneserNeySurprisal(df: DataFrame, idCol: String, textCol: String,
                         discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val toks = df.select(col(idCol).as("__id"),
      TextAnalysis.tokens(col(textCol)).as("__w"))
    val bi = toks.filter(size(col("__w")) > 0)
      .select(col("__id"), col("__w"),
        posexplode(col("__w")).as(Seq("__i", "__cur")))
      .select(col("__id"),
        when(col("__i") === 0, lit("<s>"))
          .otherwise(element_at(col("__w"), col("__i"))).as("__prev"),
        col("__cur"))
      .select(col("__id"), xxhash64(col("__prev")).as("__ph"),
        xxhash64(col("__cur")).as("__ch"),
        // space-joined pair key: tokens are whitespace-split so neither
        // side can contain a space (no ("ab","c") vs ("a","bc") collision)
        xxhash64(concat_ws(" ", col("__prev"), col("__cur"))).as("__bh"))
    // bigram type table (one row per distinct (prev,cur)): carries the
    // occurrence count plus both endpoint hashes for the fan-out counts
    val btypes = bi.groupBy(col("__bh"))
      .agg(count(lit(1)).as("__bc"),
        first(col("__ph")).as("__tph"), first(col("__ch")).as("__tch"))
    val pcounts = bi.groupBy(col("__ph")).agg(count(lit(1)).as("__pc"))
    val n1prev = btypes.groupBy(col("__tph")).agg(count(lit(1)).as("__n1p"))
    val n1cont = btypes.groupBy(col("__tch")).agg(count(lit(1)).as("__n1c"))
    val totalTypes = btypes.agg(count(lit(1)).as("__tt"))
    val d = lit(discount)
    val scored = bi
      .join(btypes.select(col("__bh"), col("__bc")), "__bh")
      .join(pcounts, "__ph")
      .join(n1prev.withColumnRenamed("__tph", "__ph"), "__ph")
      .join(n1cont.withColumnRenamed("__tch", "__ch"), "__ch")
      .crossJoin(broadcast(totalTypes))
      .select(col("__id"),
        (-log2(greatest(col("__bc") - d, lit(0.0)) / col("__pc") +
          d * col("__n1p") / col("__pc") * (col("__n1c") / col("__tt"))))
          .as("__s"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__s")), 4).as("kn_surprisal"))
    df.select(col(idCol)).join(scored, df(idCol) === scored("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_surprisal"), lit(0.0)).as("kn_surprisal"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    * score every document with the self-trained bigram LM, then split each
    * language into head / middle / tail at the per-language `lo` and `hi`
    * surprisal percentiles (head = lowest-perplexity fraction — the
    * "cleanest" slice most pipelines keep or upsample).
    *
    * Output: one row per doc — (idCol, groupCol, surprisal, bucket).
    *
    * Scale: surprisal cost is [[bigramSurprisal]] (hash-keyed shuffles,
    * text never moves). The per-group cutoffs use the exact interpolated
    * percentile — per LANGUAGE, so the aggregate's value map is bounded by
    * distinct 4-decimal surprisal values per language, and the resulting
    * cutoff table (|languages| rows) broadcasts. If a corpus has a single
    * dominant language with billions of DISTINCT surprisal values, swap the
    * exact percentile for [[graft.functions.KllQuantileAgg]] (fixed-size
    * mergeable state, measured sub-1% rank error) — bucketing tolerates
    * epsilon-rank cutoffs by design. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String,
                        lo: Double = 0.3, hi: Double = 0.7): DataFrame = {
    val scored = bigramSurprisal(df, idCol, textCol)
      .join(df.select(col(idCol), col(groupCol)), idCol)
    val cuts = scored.groupBy(col(groupCol))
      .agg(expr(s"percentile(surprisal, array(${lo}D, ${hi}D))").as("__cuts"))
    scored.join(broadcast(cuts), groupCol)
      .select(col(idCol), col(groupCol), col("surprisal"),
        when(col("surprisal") <= element_at(col("__cuts"), 1), lit("head"))
          .when(col("surprisal") <= element_at(col("__cuts"), 2), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
