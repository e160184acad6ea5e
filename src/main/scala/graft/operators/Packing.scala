package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document to a
  * contiguous token-budget bin (a "context window") in deterministic order
  * of the id column.
  *
  * Policy: bin(doc) = floor(cum_tokens_before_doc / budget). Bins fill in
  * id order and a bin may overrun by at most one document — the standard
  * one-pass streaming chunking rule. It is deterministic and replicable in
  * ANSI SQL (a window cumsum), unlike best-fit bin packing, which is
  * inherently sequential and order-sensitive.
  *
  * Scale design: the obvious `sum(w) OVER (ORDER BY id)` has an EMPTY
  * partition spec — Spark plans it as a single task holding the whole
  * dataset, a non-starter on a 1000-executor cluster. This is the textbook
  * two-phase distributed prefix sum instead:
  *   1. rows bucket by RANGE of the order key (`numBuckets` buckets);
  *   2. per-bucket totals (numBuckets rows) take an exclusive prefix sum on
  *      one tiny partition — the only serial step, O(numBuckets) rows;
  *   3. each row's global running sum = its bucket's offset + a window
  *      cumsum WITHIN the bucket, so every window partition holds ~N/B rows
  *      and the stage parallelizes across the cluster.
  */
object Packing {

  /** Adds `weight` (the evaluated weight column, e.g. a token count),
    * `cum_before` (exclusive global prefix sum of weight in `idCol` order)
    * and `bin` (= cum_before / budget) to `df`. `idCol` must be numeric,
    * unique, and roughly uniform over its range (bucket balance — ids from
    * a sequence or a hash both qualify; extreme clustering only degrades
    * parallelism, never correctness).
    */
  def packByBudget(df: DataFrame, idCol: String, weight: Column,
                   budget: Long, numBuckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val id = col(idCol)
    val rows = df.withColumn("weight", weight.cast("long"))
    // Range bounds for bucketing: one tiny aggregate over the id column
    // (column-pruned scan; at 100 TB this is a metadata-cheap pass compared
    // to the packing itself).
    val bounds = rows.agg(min(id).cast("long"), max(id).cast("long")).head()
    if (bounds.isNullAt(0))
      return rows.withColumn("cum_before", lit(0L))
        .withColumn("bin", lit(0L)).filter(lit(false))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val bucketWidth = math.max(1L, (hi - lo) / numBuckets + 1)
    val bucketed = rows.withColumn("bkt_",
      ((id.cast("long") - lo) / bucketWidth).cast("int"))
    // Phase 1+2: per-bucket totals, exclusive prefix sum over <=numBuckets
    // rows (the single-partition window is over the TOTALS, not the data).
    val offsets = bucketed.groupBy(col("bkt_"))
      .agg(sum(col("weight")).as("bw_"))
      .withColumn("off_", coalesce(sum(col("bw_")).over(
        Window.orderBy(col("bkt_"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("bw_")
    // Phase 3: intra-bucket cumsum; buckets are range-disjoint in id, so
    // offset + local prefix == global prefix.
    val local = Window.partitionBy(col("bkt_")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("bkt_"))
      .withColumn("cum_before",
        col("off_") + coalesce(sum(col("weight")).over(local), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .drop("bkt_", "off_")
  }
}
