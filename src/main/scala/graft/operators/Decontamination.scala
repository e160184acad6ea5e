package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Benchmark decontamination: find (and remove) training documents that
  * overlap an evaluation/benchmark set — the standard n-gram-collision rule
  * used to keep eval data out of training corpora. A document is
  * contaminated when it shares at least `minOverlap` distinct word n-gram
  * shingles with any SINGLE benchmark document.
  *
  * Scale design (100 TB corpus, MB–GB benchmark):
  *  - both sides explode to (id, shingle-hash) pairs; the join carries
  *    8-byte hashes, never text. Joining on 64-bit shingle hashes is
  *    exact modulo ~2^-64 collisions — same equivalence the Jaccard and
  *    MinHash operators rely on, so a string-join SQL oracle replicates
  *    the output bit-for-bit.
  *  - the benchmark side is tiny by construction (eval suites), so Spark
  *    broadcasts it: the corpus never shuffles for the join. Only the
  *    matched (doc, bench, shingle) hits — a sliver — reach the
  *    aggregation, and the per-(doc,bench) overlap counts partial-agg
  *    map-side before that shuffle.
  *  - removal is a left-anti join of the corpus against the (small)
  *    contaminated-id set, again broadcast.
  */
object Decontamination {

  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
                            n: Int, outId: String) =
    df.select(col(idCol).as(outId),
        explode(TextAnalysis.wordShingles(col(textCol), n)).as("s0"))
      .select(col(outId), xxhash64(col("s0")).as("s"))

  /** Per-contaminated-document report: how many benchmark docs it collides
    * with, the largest single-benchmark overlap, and the benchmark doc
    * achieving it (ties broken toward the smallest bench id).
    * Output: (doc_id, n_bench_hits, max_overlap, worst_bench_id). */
  def contaminationReport(docs: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          benchIdCol: String, benchTextCol: String,
                          n: Int, minOverlap: Int): DataFrame = {
    require(minOverlap >= 1)
    val d = shingleHashes(docs, idCol, textCol, n, "doc_id")
    val b = shingleHashes(bench, benchIdCol, benchTextCol, n, "bench_id")
    val hits = d.join(broadcast(b), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
    hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        max(col("overlap")).as("max_overlap"),
        // bench doc with the largest overlap; ties -> smallest bench id.
        // min_by over struct(-overlap, bench_id): negation sits on the
        // always-numeric count, never on bench_id, so string/UUID benchmark
        // ids work (max_by over struct(overlap, -bench_id) crashed on them).
        expr("min_by(bench_id, struct(-overlap, bench_id))").as("worst_bench_id"))
  }

  /** The corpus with contaminated documents removed. */
  def decontaminate(docs: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    benchIdCol: String, benchTextCol: String,
                    n: Int, minOverlap: Int): DataFrame = {
    val bad = contaminationReport(docs, bench, idCol, textCol,
      benchIdCol, benchTextCol, n, minOverlap).select(col("doc_id"))
    docs.join(bad, docs(idCol) === bad("doc_id"), "left_anti")
  }

  /** Cross-source overlap matrix: for every unordered pair of corpus
    * sources, the number of DISTINCT word n-grams they share, each side's
    * distinct-n-gram total, and the n-gram Jaccard — the standard
    * diligence pass before mixing corpora (which crawls duplicate each
    * other? is a "new" source mostly a re-crawl?). Pairs sharing nothing
    * are omitted.
    *
    * Scale: per-source distinct n-grams reduce to 8-byte hashes before any
    * shuffle (same exact-modulo-2^-64 equivalence as the dedup operators);
    * the pair join is an equi-join on those hashes, and a single n-gram
    * common to S sources contributes at most S² pair rows — bounded by the
    * (small) source count, not the corpus. Output: (source_a, source_b,
    * shared_ngrams, total_a, total_b, jaccard), source_a < source_b. */
  def overlapMatrix(df: DataFrame, sourceCol: String, textCol: String,
                    n: Int): DataFrame = {
    val sg = df.select(col(sourceCol).as("source"),
        explode(TextAnalysis.wordShingles(col(textCol), n)).as("s0"))
      .select(col("source"), xxhash64(col("s0")).as("s"))
      .distinct()
    val totals = sg.groupBy(col("source")).agg(count(lit(1)).as("total"))
    val a = sg.select(col("source").as("source_a"), col("s"))
    val b = sg.select(col("source").as("source_b"), col("s"))
    a.join(b, Seq("s")).filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .join(totals.select(col("source").as("source_a"),
        col("total").as("total_a")), "source_a")
      .join(totals.select(col("source").as("source_b"),
        col("total").as("total_b")), "source_b")
      .withColumn("jaccard", round(col("shared_ngrams") * lit(1.0) /
        (col("total_a") + col("total_b") - col("shared_ngrams")), 6))
      .select(col("source_a"), col("source_b"), col("shared_ngrams"),
        col("total_a"), col("total_b"), col("jaccard"))
  }
}
