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
}
