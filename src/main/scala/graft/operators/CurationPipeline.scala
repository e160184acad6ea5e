package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The COMPOSED training-data curation pipeline — every stage exists (and
  * is gated) individually; this chains them as one dataflow so the
  * cross-stage contracts (id stability, ordering determinism, column
  * flow) are themselves under a value-exact gate:
  *
  *   normalize → exact-dedup (fingerprint, min-id rep)
  *             → MinHash-LSH near-dup pairs (exact-verified)
  *             → connected-components keep-best (longest text, ties → min id)
  *             → decontaminate vs a benchmark set (3-gram overlap ≥ 2)
  *             → NB quality filter (order-structure log-odds ≥ 0)
  *             → mixture sample (per-source token shares, hash membership)
  *             → pack (token-budget bins, distributed prefix sum)
  *             → shard (deterministic shuffle-shard)
  *
  * Output: one row per document that survives every stage, with its full
  * lineage — (id, source, n_tok, nb_logodds, bin, shard, shard_pos).
  *
  * Scale shape is inherited stage by stage (each documented at its own
  * operator): text shuffles NOWHERE — dedup moves fingerprints, CC runs
  * on the pair sliver, decontamination broadcasts the benchmark shingle
  * hashes, NB moves 8-byte bigram keys, sampling broadcasts an S-row
  * fraction frame, packing and sharding use the two-phase prefix sum
  * (global windows only over per-bucket totals). Every stage is a pure
  * deterministic function of the corpus, so the composition is too. */
object CurationPipeline {

  /** Run the full chain. `bench` is the benchmark/eval corpus to
    * decontaminate against (disjoint from `docs` by contract — the gate
    * splits on doc_id % 97). `targetShare` keys must cover every source
    * that may survive to the sampling stage (mixtureSample drops
    * unlisted strata, by its documented contract).
    *
    * STORAGE NOTE: the FINAL stage cut (`packed`) stays resident after
    * this returns — the returned lazy frame reads from it, so it cannot
    * be released here (and cleanCheckpoints defaults to false, see
    * ConnectedComponents.release). One |survivors|-sized checkpoint leaks
    * per run() for the session's lifetime; callers that invoke the
    * pipeline repeatedly in one session should sweep persistent RDDs
    * after consuming the result (the bench harness does this between
    * queries). */
  def curate(docs: DataFrame, bench: DataFrame, idCol: String,
             textCol: String, sourceCol: String,
             targetShare: Map[String, Double], totalBudget: Long,
             packBudget: Long, nShards: Int,
             ngram: Int = 3, jaccardThreshold: Double = 0.8,
             minOverlap: Int = 2, nbThreshold: Double = 0.0): DataFrame = {
    // Lineage is CUT (eager localCheckpoint) at every stage boundary, and
    // each cut is released as soon as the next one is materialized. This
    // changes no value — a checkpoint is the identity on data — but it is
    // the difference between a composed plan and a composed EXPLOSION:
    // every stage below references its input several times (LSH pairs
    // self-join, NB trains on the corpus it then joins back to, mixture /
    // packing re-aggregate their input), so an uncut composition re-plans
    // and re-executes the whole upstream chain multiplicatively — measured
    // 30.5 s wall with only 10.9 s of executor job time (145 jobs, the
    // rest Catalyst re-planning one enormous tree per internal action).
    // Cut, each operator plans against a flat scan of its predecessor.
    var prevCut: DataFrame = null
    def cut(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      if (prevCut != null) ConnectedComponents.release(prevCut)
      prevCut = c
      c
    }
    // 1. normalize (strip control chars, collapse whitespace) — all
    //    downstream stages read the normalized text
    val norm = docs.select(col(idCol), col(sourceCol),
      TextAnalysis.normalizeText(col(textCol)).as("t"))
    val benchNorm = bench.select(col(idCol),
      TextAnalysis.normalizeText(col(textCol)).as("t"))
    // 2. exact dedup: fingerprint groups, keep the min-id representative
    val exact = cut(Dedup.exactDedup(norm, idCol, "t")
      .filter(col("is_rep"))
      .select(col(idCol), col(sourceCol), col("t")))
    // 3 + 4. near-dup pairs (MinHash-LSH banding with inline exact
    //    verify) → connected components → keep the longest member
    val pairs = Dedup.minHashLshPairs(exact, idCol, "t",
      n = ngram, threshold = jaccardThreshold)
    val kept = ConnectedComponents.representatives(
        exact, pairs, idCol, "id_a", "id_b", length(col("t")))
      .filter(col("is_rep"))
      .select(col(idCol), col(sourceCol), col("t"))
    // 5. decontaminate: drop survivors sharing >= minOverlap distinct
    //    word n-grams with any benchmark doc
    val clean = cut(Decontamination.decontaminate(kept, benchNorm,
      idCol, "t", idCol, "t", n = ngram, minOverlap = minOverlap))
    // 6. NB quality filter: keep docs whose order structure beats their
    //    scrambled twin (log-odds >= nbThreshold); the model trains on
    //    the surviving corpus itself (self-supervised)
    val nb = QualityClassifier.naiveBayesCleanVsScrambled(clean, idCol, "t")
    val quality = cut(clean.join(nb, idCol)
      .filter(col("nb_logodds") >= nbThreshold))
    // 7. mixture sample to the target per-source token shares
    val sampled = cut(Sampling.mixtureSample(quality, sourceCol, idCol,
      TextAnalysis.tokenCount(col("t")), targetShare, totalBudget))
    // 8. pack into token-budget bins (id order)
    val packed = cut(Packing.packByBudget(sampled, idCol,
      TextAnalysis.tokenCount(col("t")), budget = packBudget))
    // 9. deterministic shuffle-shard
    Sharding.shuffleShard(packed, idCol, nShards)
      .select(col(idCol), col(sourceCol), col("weight").as("n_tok"),
        col("nb_logodds"), col("bin"), col("shard"), col("shard_pos"))
  }
}
