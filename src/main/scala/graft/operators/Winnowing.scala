package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): slide a window of `w` consecutive char
  * k-gram hashes over the normalized text and keep each window's minimum
  * hash. The guarantee: any shared substring of length >= w + k - 1
  * between two documents yields at least one shared fingerprint, while
  * the expected density of selected hashes is only 2/(w+1) — a
  * principled, position-robust alternative to fixed-stride shingle
  * sampling for plagiarism/near-dup detection.
  *
  * The k-gram hash is the low 60 bits of md5 (first 15 hex chars parsed
  * base-16) rather than a bespoke rolling hash: deterministic, available
  * verbatim in any SQL engine (value-exact oracle gates), and collision
  * odds at 2^-60 are irrelevant for screening. At 100 TB the hash cost is
  * a row-local scan-speed concern only — nothing below ever shuffles
  * text, just (id, 8-byte hash) rows.
  */
object Winnowing {

  /** Distinct winnowing fingerprint hashes per document:
    * (id, fp) — one row per distinct selected hash.
    *
    * Selection: positions p = 1..n-k+1 carry hash(substr(t, p, k)); every
    * full window of `w` consecutive positions contributes min(hash) over
    * the window. Documents with fewer than w k-grams contribute the min
    * over all their k-grams (one truncated window), so every document
    * with at least one k-gram has at least one fingerprint. Documents
    * shorter than k characters (after lower+trim) produce no rows.
    *
    * Scale: selection is entirely ROW-LOCAL — one codegen kernel pass per
    * document (graft.functions.HashKernels.winnowFpsOf) computes the
    * k-gram hash array, the sliding-window minima, and the distinct set
    * with zero per-position rows, shuffles, or sorts. The first shuffle
    * anything downstream sees is over the 2/(w+1)-dense (id, 8-byte hash)
    * output. Two rejected formulations, both value-identical: a window
    * function over exploded per-k-gram rows (pays a 15M-row partition
    * sort at 10x bench scale), and a pure array-expression pipeline
    * (optimizer-fragile — CollapseProject inlines the gram-array alias
    * into the per-window lambda and re-hashes the whole document once
    * per window; measured ~300x overcompute). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.expressions.winnow_fps(col(textCol), k, w)).as("fp"))

  /** Document pairs whose winnowing fingerprint sets overlap:
    * (id_a, id_b, shared, overlap) with id_a < id_b and
    * overlap = shared / min(|fp_a|, |fp_b|) >= `threshold`.
    *
    * `maxDf`: fingerprints appearing in more than `maxDf` documents are
    * dropped before the self-join — boilerplate hashes otherwise generate
    * df^2 candidate rows (same document-frequency cap every shingle-join
    * dedup here uses). Overlap is computed against the FULL per-doc
    * fingerprint counts, so the cap only loses pairs whose entire overlap
    * is boilerplate.
    *
    * Scale: self-join on 8-byte hashes with df-bounded fan-out, then one
    * aggregate per candidate pair — the q_dedup_containment shape. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4, threshold: Double = 0.5,
                   maxDf: Int = 64): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w).cache()
    val sizes = fps.groupBy(col("id")).agg(count(lit(1)).as("__sz"))
    val rare = fps.join(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf)
        .select(col("fp")),
      "fp")
    val a = rare.select(col("id").as("id_a"), col("fp"))
    val b = rare.select(col("id").as("id_b"), col("fp"))
    val shared = a.join(b, "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("__sz").as("__sa")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("__sz").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("shared") / least(col("__sa"), col("__sb")), 4).as("overlap"))
      .filter(col("overlap") >= threshold)
  }
}
