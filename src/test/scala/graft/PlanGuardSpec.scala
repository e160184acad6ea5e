package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Standing scale guard over EVERY gated query's physical plan: the three
  * operators that silently stop scaling — a partition-less Window (single
  * task holds the whole input), a BroadcastNestedLoopJoin (per-row scan of
  * the broadcast side), and a CartesianProduct — may only appear where a
  * documented bounded-size argument exists, enumerated in the allowlists
  * below. A new query that sneaks one in fails here with its plan. */
class PlanGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin: every occurrence is a
    * crossJoin against a broadcast CONSTANT-SIZE frame (a single scalar
    * row or the <=16-row centroid table), so the "nested loop" is one
    * in-memory pass of bounded width per row. */
  private val bnljOk = Set(
    "q_ann_ivf", "q_ann_ivf_kmeans",       // broadcast centroid table (<=16 rows)
    "q_ann_ivfpq",                         // broadcast centroid table (auto-C ~ 8·sqrt(N) small rows)
    "q_ann_ivfpq_index",                   // same probe-side broadcast centroid table, served from parquet
    "q_ann_ivfpq_index_incremental",       // same (standing + appended code partitions)
    "q_ann_ivfpq_index_delete",            // same (tombstone-masked codes)
    "q_ann_ivfpq_residual_index",          // same (by-residual codes; probe side unchanged)
    "q_ann_ivfpq_index_stream",            // same (streamed residual code partitions)
    "q_ann_ivfpq_residual_lifecycle",      // same (appended + tombstone-masked residual codes)
    "q_ann_ivfpq_index_purge",             // same (purged residual codes, fresh root)
    "q_ann_ivfpq_filtered",                // same (allowed-id semi-join precedes the ADC)
    "q_ann_ivfpq_range",                   // same probe side; retention is threshold, not heap
    "q_ann_ivfpq_merge",                   // same (merged shard code partitions)
    "q_ann_ivfpq_opq_index",               // same (rotated corpus; probe side unchanged)
    "q_ann_ivfpq_opq_lifecycle",           // same (auto-rotated streamed codes)
    "q_ann_ivfpq_hier_index",              // same (hierarchically-trained centroid table)
    "q_ann_ivfsq_index",                   // same probe-side broadcast centroid table (IVF-SQ8)
    "q_ann_ivfsq_index_delete",            // same (tombstone-masked codes)
    "q_ann_ivfsq_index_incremental",       // same (standing + appended code partitions)
    "q_ann_ivfsq_index_stream",            // same (streamed code partitions)
    "q_ann_ivfsq_index_purge",             // same (purged codes, fresh root)
    "q_dedup_semantic",                    // broadcast centroid table (8 rows)
    "q_diversity_sample",                  // broadcast centroid table (16 rows)
    "q15_top_supplier", "q22_global_sales", // broadcast scalar-aggregate row
    "q_sketch_tokens", "q_corpus_clean",    // broadcast single-row threshold/sketch
    "q_tfidf",                              // broadcast single-row doc count
    "q_bm25",                               // broadcast single-row N/avgdl scalars
    "q_hybrid_retrieval", // inherits q_bm25's scalar frames and
                          // q_ann_bruteforce's broadcast query set — the
                          // fusion itself is an equi-join of two top-k slivers
    "q_hybrid_retrieval_pq", // inherits q_bm25's scalar frames and the
                             // IVF-PQ probe side's broadcast centroid
                             // table; the PQ leg's corpus work is the
                             // probe-bounded ADC kernel, never a loop join
    "q_ann_bruteforce",  // the documented EXACT baseline: broadcast query set
                         // vs corpus with a non-equi self-exclusion — the
                         // bucketed lshTopK is the scale path
    "q_hard_negatives",  // same broadcast-anchors exact shape; the PQ-served
                         // hardNegativesPq is the scale path (spec-asserted)
    "q_unigram_surprisal", // broadcast single-row token total (tf-idf pattern)
    "q_dsir_weights",      // two broadcast single-row frames: the (tr, tt)
                           // feature totals and the selection threshold
    "q_kneser_ney",        // broadcast single-row bigram-type total
                           // (unigram-surprisal pattern)
    "q_mixture_weights",   // broadcast single-row (z, total) scalar frame
                           // over the |sources|-row stratum aggregate
    "q_cluster_purity",    // broadcast centroid table (16 rows)
    "q_collocations",      // broadcast single-row (n_tokens, n_bigrams)
                           // totals frame (tf-idf pattern)
    "q_quality_nb",        // broadcast single-row (np, nn, v) smoothing
                           // totals frame (tf-idf pattern)
    "q_lang_id_nb",        // broadcast |langs|-row (prior, dflt) scalar
                           // frame + single-row vocab/total frames in
                           // the fixture training subtree
    "q_lang_id_nb_supervised", // same scalar frames, corpus-trained
    "q_pipeline_e2e"       // inherits q_quality_nb's broadcast single-row
                           // smoothing-totals frame (the NB filter stage)
  )

  /** Queries allowed a partition-less Window: the window runs over the
    * per-bucket TOTALS of the two-phase distributed prefix sum (<=256
    * rows), never over the data. */
  private val globalWindowOk = Set("q_pack_sequences", "q_shard_assign",
    // token-budget selection: the unpartitioned window is the prefix sum
    // over per-priority-bucket totals (<= distinct 4dp quality values);
    // the per-doc running sum is partitioned by priority bucket
    "q_token_budget",
    // sorted-neighborhood rank: the unpartitioned window is the offset
    // cumsum over per-bucket COUNTS (<= |alphabet|^bucketLen rows); the
    // per-row rank window is partitioned by bucket
    "q_fuzzy_neighborhood",
    // the composed pipeline inherits pack/shard's two-phase prefix sums:
    // its unpartitioned windows run over per-bucket TOTALS only
    "q_pipeline_e2e")

  /** Every physical node, descending into subqueries. At the sparkPlan
    * stage a subquery expression may still hold a LOGICAL plan (scalar
    * subqueries and DPP filters are planned in the executedPlan
    * preparations) — those are planned standalone here so the guard
    * covers them too instead of crashing on the cast (r17, surfaced by
    * the composed-pipeline gates). */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectAll)) ++
      p.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          e.plan match {
            case sp: SparkPlan => collectAll(sp)
            case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
              collectAll(new org.apache.spark.sql.execution.QueryExecution(
                spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
                lp).sparkPlan)
            case _ => Nil
          }
      }).flatten

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"plan guard: $name") {
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val nodes = collectAll(plan)
      val badWindow = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w }
      if (!globalWindowOk(name))
        assert(badWindow.isEmpty,
          s"partition-less Window in $name:\n$plan")
      val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
      if (!bnljOk(name))
        assert(bnlj.isEmpty, s"BroadcastNestedLoopJoin in $name:\n$plan")
      val cart = nodes.collect { case j: CartesianProductExec => j }
      assert(cart.isEmpty, s"CartesianProduct in $name:\n$plan")
    }
}
