package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level term weighting. All plans are pure DataFrame aggregations —
  * partial aggregation and AQE handle the shuffles; nothing collects to the
  * driver (the corpus size N rides along as a broadcast one-row frame).
  */
object TextRanking {

  /** Top-k terms per document by tf-idf (tf * ln(N / df)).
    * Rank orders by the ROUNDED score (6 dp) then term — rounding first
    * makes the ordering reproducible across engines whose libm ln() may
    * differ in the last ulp. Output: (id, rank, term, tfidf).
    *
    * Scale: tf is a (doc, term) aggregate (map-side combine), df a term
    * aggregate over tf (8-byte hashable keys), the final top-k one window
    * partitioned by doc — every shuffle key is bounded, no driver state. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val terms = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df and the per-term posting list in ONE aggregation: the
    // groupBy(term).count + join-back-to-tf formulation shuffles tf by term
    // twice (once for the count, once for the join); collecting (id, tf)
    // alongside the count shuffles it once. Posting-list length is bounded
    // by df; AQE splits skewed stopword-like terms.
    val byTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        collect_list(struct(col("id"), col("tf"))).as("ids"))
    val nDocs = df.agg(count(lit(1)).as("n_total"))
    val scored = byTerm
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"), col("n_total"),
        explode(col("ids")).as("e"))
      .select(col("term"), col("e.id").as("id"), col("e.tf").as("tf"),
        col("df"), col("n_total"))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_total") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Okapi BM25 top-k documents per query — the standard lexical retrieval
    * scorer a RAG / eval harness runs against a corpus:
    *
    *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   score(q, d) = Σ_{t ∈ distinct terms of q}  idf(t) ·
    *                   tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·len(d)/avgdl))
    *
    * (the Robertson–Spärck Jones plus-one idf, always positive; avgdl is
    * the mean token count over ALL docs, empty docs counting as length 0.)
    * Documents sharing no term with a query are absent from its ranking —
    * standard retrieval semantics. Rank orders by the ROUNDED score (6 dp)
    * then doc id, reproducible across engines like tfidfTopTerms.
    * Output: (q_id, rank, id, score).
    *
    * Scale: corpus statistics are the same bounded aggregates as tf-idf —
    * tf per (doc, term), df per term, two broadcast scalars (N, avgdl).
    * The query set is small by construction, so its distinct terms (with
    * their df) BROADCAST into the tf join: the corpus never shuffles for
    * candidate selection, only the matched (query, doc) slivers reach the
    * per-pair aggregate, and the final top-k is a per-query window. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dlen = terms.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scal = docs.agg(count(lit(1)).as("n_total"))
      .crossJoin(terms.agg(count(lit(1)).as("tok_total")))
      .select(col("n_total"),
        (col("tok_total") / col("n_total")).as("avgdl"))
    val qterms = queries.select(col(qIdCol).as("q_id"),
        explode(TextAnalysis.tokens(col(qTextCol))).as("term"))
      .distinct()
      .join(dft, "term") // unseen query terms contribute 0 — drop them here
    val hits = tf.join(broadcast(qterms), "term")
      .join(dlen, "id")
      .crossJoin(broadcast(scal))
      .withColumn("idf",
        log(lit(1.0) + (col("n_total") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + (lit(1.0) - b + col("dl") * b / col("avgdl")) * k1))
    val scored = hits.groupBy(col("q_id"), col("id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of two
    * rankings of the same corpus — the standard hybrid-retrieval combiner
    * (BM25 ⊕ embedding ANN) modern RAG stacks ship, chosen over score
    * interpolation because it needs no score normalization across
    * heterogeneous scorers:
    *
    *   rrf(d) = Σ_{lists containing d} 1 / (rrfK + rank_list(d))
    *
    * Inputs are any two frames with (q_id, id, rank) columns (extra
    * columns ignored), e.g. [[bm25TopK]] and
    * [[SimilaritySearch.bruteForceTopK]]/lshTopK output. A document
    * absent from one list simply contributes nothing from it. Output:
    * (q_id, rank, id, rrf_score, rank_a, rank_b) — rank_a/rank_b are the
    * source ranks (null when absent), final rank orders by rrf desc then
    * id, top `k` per query.
    *
    * Scale: the inputs are already top-k lists (Q·k rows each) — the fuse
    * is a (q_id, id) equi-join of two slivers plus a per-query window;
    * all heavy lifting stays in the upstream rankers. Determinism: ranks
    * are integers, 1/(rrfK+rank) is the same IEEE double in any engine,
    * ties break by id — so the fusion is value-exact replicable in SQL. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Int = 60): DataFrame = {
    val ra = a.select(col("q_id"), col("id"), col("rank").as("rank_a"))
    val rb = b.select(col("q_id"), col("id"), col("rank").as("rank_b"))
    val fused = ra.join(rb, Seq("q_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")), lit(0.0)))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("id"),
        round(col("rrf"), 6).as("rrf_score"), col("rank_a"), col("rank_b"))
  }

  /** Exact phrase search over a corpus via a positional join — the
    * "grep the lake for these quoted strings" primitive (contamination
    * audits, eval-set provenance, doc lookup). A phrase matches at token
    * anchor a iff token(a+i) == phrase token i for every i; matching is on
    * the normalized token stream (lowercased, whitespace-split), so
    * punctuation-free containment, not raw substring.
    *
    * Output: (q_id, doc_id, n_matches, first_pos) — one row per
    * (phrase, document) with >= 1 match; n_matches counts anchors
    * (overlapping occurrences included), first_pos is the 0-based token
    * index of the earliest match.
    *
    * Scale: ONE broadcast join + one aggregation, phrase-length-agnostic —
    * no per-length join chain. The phrase term table (q_id, idx, term)
    * broadcasts; corpus tokens that match no phrase term die in the join,
    * so only candidate slivers reach the (q_id, doc, anchor) aggregate.
    * Each surviving (pos, idx) row is unique, so a full match at anchor a
    * is exactly `count == phrase length` (duplicate terms inside a phrase
    * — "the the" — contribute distinct idx rows, never double-counted). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame, qIdCol: String,
                   phraseCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
    val pterms = phrases.select(col(qIdCol).as("q_id"),
      posexplode(TextAnalysis.tokens(col(phraseCol))).as(Seq("idx", "term")))
    // a phrase with zero tokens matches nothing (dropped here, not
    // everything-matches — the degenerate reading a naive oracle gives)
    val plen = phrases.select(col(qIdCol).as("q_id"),
      size(TextAnalysis.tokens(col(phraseCol))).as("m"))
      .filter(col("m") >= 1)
    toks.join(broadcast(pterms), "term")
      .select(col("q_id"), col("doc_id"),
        (col("pos") - col("idx")).as("anchor"))
      .filter(col("anchor") >= 0)
      .groupBy(col("q_id"), col("doc_id"), col("anchor"))
      .agg(count(lit(1)).as("hit"))
      .join(broadcast(plen), "q_id")
      .filter(col("hit") === col("m"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("anchor")).as("first_pos"))
  }
}
