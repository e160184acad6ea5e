package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much more likely its hashed n-gram features
  * are under a target distribution than under the raw distribution, then
  * keep the top-weighted documents. The classic "select web text that looks
  * like the high-quality target corpus" primitive.
  *
  * Features are unigrams + bigrams of the normalized token stream, hashed
  * into B = 16^hexChars buckets by the first hexChars characters of
  * md5(gram) — a STRING bucket key, chosen deliberately so the oracle can
  * replicate the bucketing verbatim (DuckDB and Spark md5 agree
  * byte-for-byte; no engine-specific integer hash is involved).
  *
  * Bucket unigram models with add-alpha smoothing:
  *   p_hat(b) = (c_tgt(b) + alpha) / (T_tgt + alpha * B)
  *   q_hat(b) = (c_raw(b) + alpha) / (T_raw + alpha * B)
  *   log w(d) = round(sum_b n_d(b) * (ln p_hat(b) - ln q_hat(b)), 6)
  *
  * Documents with no features (empty text) get log weight 0.
  *
  * Scale: ONE pass over the corpus n-gram stream — the per-(doc, bucket)
  * counts are the only corpus-sized aggregate; the global and target bucket
  * tables re-aggregate those partial counts (never the corpus) and are at
  * most B <= 16^hexChars rows, which BROADCAST back into the per-doc sum.
  * Nothing collects to the driver; no all-pairs anything.
  */
object ImportanceSampling {

  /** Per-document DSIR log importance weights: (doc_id, log_weight).
    * `targetPred` marks the in-corpus target slice (evaluated against the
    * raw rows — e.g. col("source") === "wiki" or a quality-score cut). */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, hexChars: Int = 3,
                     alpha: Double = 0.5): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1, 8], got $hexChars")
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val numBuckets = math.pow(16.0, hexChars.toDouble)
    val base = docs.select(col(idCol).as("doc_id"), targetPred.as("is_tgt"),
      col(textCol).as("__text"))
    // non-distinct unigrams + bigrams from ONE tokenization pass
    // (shingle_range_rows emits the same strings per width as the old
    // two-select union, which scanned and tokenized the corpus twice)
    val feats = base.select(col("doc_id"), col("is_tgt"),
        expressions.shingle_range_rows(col("__text"), 1, 2))
      .select(col("doc_id"), col("is_tgt"),
        substring(md5(col("shingle")), 1, hexChars).as("b"))
    // the only corpus-sized aggregate; everything below re-aggregates it.
    // (A persist() here was measured SLOWER than the recompute at bench
    // scale — the columnar cache build plus its wide downstream stages
    // cost more than re-running the one feature pass for the bucket-stats
    // broadcast subtree; both references stay lazy.)
    val docb = feats.groupBy(col("doc_id"), col("is_tgt"), col("b"))
      .agg(count(lit(1)).as("n"))
    val rawb = docb.groupBy(col("b"))
      .agg(sum(col("n")).as("cr"),
        sum(when(col("is_tgt"), col("n")).otherwise(0L)).as("ct"))
    val tot = rawb.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val bstats = rawb.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + alpha) / (col("tt") + alpha * numBuckets))
          - log((col("cr") + alpha) / (col("tr") + alpha * numBuckets)))
          .as("llr"))
    val weights = docb.join(broadcast(bstats), "b")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("n") * col("llr")), 6).as("log_weight"))
    base.select(col("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** DSIR selection: (doc_id, log_weight, selected) with selected = 1 for
    * the `n` documents ranked highest by (log_weight DESC, doc_id ASC).
    *
    * The flag is computed WITHOUT a partition-less window: the selection
    * threshold — the worst (weight, id) pair inside the top n — comes from
    * a TakeOrdered-of-TakeOrdered (two 1-ish-row limits), broadcast as a
    * single-row frame; the flag is then a row-local comparison. Ranking is
    * on the ROUNDED weight, so the cut is reproducible across engines. */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
                   targetPred: Column, n: Int, hexChars: Int = 3,
                   alpha: Double = 0.5): DataFrame = {
    require(n > 0, s"n must be > 0, got $n")
    // CUT the weight table (eager localCheckpoint, identity on data —
    // |docs| rows of 16 bytes): the threshold broadcast below otherwise
    // re-executed the whole corpus-sized weights pipeline once for the
    // limit and again for the flag join (measured: twin 1.2 s feature
    // jobs in the gate profile)
    val w = dsirLogWeights(docs, idCol, textCol, targetPred, hexChars, alpha)
      .localCheckpoint(true)
    val thr = w.orderBy(col("log_weight").desc, col("doc_id").asc).limit(n)
      .orderBy(col("log_weight").asc, col("doc_id").desc).limit(1)
      .select(col("log_weight").as("__tw"), col("doc_id").as("__tid"))
    w.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("log_weight"),
        when(col("log_weight") > col("__tw")
          || (col("log_weight") === col("__tw")
            && col("doc_id") <= col("__tid")), 1).otherwise(0).as("selected"))
  }
}
