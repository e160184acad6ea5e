package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Blocklist / badword filtering — the keyword-screening stage every
  * web-corpus pipeline runs before the expensive quality models (C4 drops
  * any page containing a "bad words" list hit; most production pipelines
  * soften that to a hit-count threshold). Single-word terms match at the
  * token level; multi-word phrases match as exact consecutive token runs
  * (delegated to [[TextRanking.phraseSearch]]'s positional join).
  *
  * Scale: the blocklist (thousands of terms at most) BROADCASTS; documents
  * contribute (doc, token) rows that partial-aggregate map-side, so the
  * text never shuffles and the cost is one scan. No per-row UDF — the whole
  * thing is a declarative join so Catalyst keeps it inside codegen.
  */
object Blocklist {

  /** Annotate every document with its blocklist exposure.
    *
    * Output: (id, term_hits, distinct_terms, phrase_hits, blocked) where
    * term_hits counts token OCCURRENCES matching single-word terms,
    * distinct_terms counts which terms matched at all, phrase_hits counts
    * phrase occurrences (overlapping, phraseSearch semantics), and
    * blocked = any hit at all. Terms/phrases are normalized with the same
    * tokenizer as the documents (lowercase, whitespace split), so "FOO"
    * matches "foo"; multi-word entries in `terms` are routed to the phrase
    * path automatically. */
  def annotate(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val spark = df.sparkSession
    import spark.implicits._

    val normed = terms.map(t => t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty).distinct
    val single = normed.filter(_.length == 1).map(_.head)
    val multi = normed.filter(_.length > 1).map(_.mkString(" "))

    val tokHits =
      if (single.isEmpty)
        df.select(col(idCol).as("__id"), lit(0L).as("term_hits"),
          lit(0L).as("distinct_terms")).limit(0)
      else {
        val termDf = single.toDF("__term")
        df.select(col(idCol).as("__id"),
            explode(TextAnalysis.tokens(col(textCol))).as("__term"))
          .join(broadcast(termDf), "__term")
          .groupBy(col("__id"))
          .agg(count(lit(1)).as("term_hits"),
            countDistinct(col("__term")).as("distinct_terms"))
      }

    val phraseHits =
      if (multi.isEmpty)
        df.select(col(idCol).as("__id"), lit(0L).as("phrase_hits")).limit(0)
      else {
        val phraseDf = multi.zipWithIndex.map { case (p, i) => (i, p) }
          .toDF("__qid", "__phrase")
        TextRanking.phraseSearch(df, idCol, textCol, phraseDf, "__qid", "__phrase")
          .groupBy(col("doc_id").as("__id"))
          .agg(sum(col("n_matches")).as("phrase_hits"))
      }

    df.select(col(idCol))
      .join(tokHits, df(idCol) === tokHits("__id"), "left").drop("__id")
      .join(phraseHits, df(idCol) === phraseHits("__id"), "left").drop("__id")
      .select(col(idCol),
        coalesce(col("term_hits"), lit(0L)).as("term_hits"),
        coalesce(col("distinct_terms"), lit(0L)).as("distinct_terms"),
        coalesce(col("phrase_hits"), lit(0L)).as("phrase_hits"),
        (coalesce(col("term_hits"), lit(0L)) +
          coalesce(col("phrase_hits"), lit(0L)) > 0).as("blocked"))
  }
}
