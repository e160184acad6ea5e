package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Smoke coverage for the driver contract: every declared query runs at
  * sf0.001, returns rows, and has an oracle (or is explicitly rows-only).
  * Value-level correctness is the driver's DuckDB gate, replicated locally by
  * scripts/oracle_check.py. */
class SparkEntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs at sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("oracle coverage: every query has oracle SQL or is known rows-only") {
    // hash-based / approximate ops whose outputs aren't ANSI-SQL-replicable
    // (q_ann_ivf left this list in round 5: its centroid arithmetic IS
    // SQL-replicable and it carries a full oracle now)
    val rowsOnly = Set("q_dedup_simhash", "q_ann_lsh",
      "q_ann_ivf_kmeans", "q_sketch_tokens", "q_approx_distinct",
      // PQ-family ANN: k-means codebooks aren't SQL-replicable; recall
      // vs q_ann_bruteforce is measured into the evidence file instead
      "q_ann_pq", "q_ann_pq_index", "q_ann_ivfpq",
      // iterative global-argmax training loop — no SQL formulation; exact
      // equality with a single-threaded reference is pinned in BpeSpec
      "q_bpe_merges",
      // applies the trained merge list (iterative, no SQL form); Verify
      // emits exact-agreement-vs-segmentWord evidence on the full sf corpus
      "q_bpe_encode",
      // L-BFGS logistic training has no SQL form; Verify emits holdout
      // AUC + clean-vs-scrambled separation evidence
      "q_quality_classifier",
      // KLL sketch: approximate by contract (rank bound, merge-order
      // sensitive); Verify measures realized rank error vs the exact
      // column; KllQuantileAggSpec asserts the bound adversarially
      "q_quantile_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries missing oracles: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
