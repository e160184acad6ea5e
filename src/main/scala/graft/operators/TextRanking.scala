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
}
