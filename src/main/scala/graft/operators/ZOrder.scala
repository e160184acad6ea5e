package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — the
  * OPTIMIZE ZORDER step every lake engine runs before heavy multi-
  * dimensional scan workloads: rows that are close in EVERY clustered
  * column land in the same output partition/file, so per-file (or
  * per-row-group / per-block) min-max stats prune a 2-D range predicate
  * instead of only the leading sort column.
  *
  * Mechanics, chosen so every step has an exact SQL replica:
  *  1. per-column QUANTILE bucketing — cutoffs at j/B via the exact
  *     interpolated percentile (rank-based like Delta's range-id approach,
  *     so a skewed column still spreads across all B buckets; min-max
  *     scaling would collapse under skew);
  *  2. bucket index = #cutoffs <= value (a row-local filter over the
  *     broadcast B-1 cutoff literals);
  *  3. Morton interleave of the per-column bucket bits into one long;
  *  4. `repartitionByRange` on the z-value + an in-partition sort.
  *
  * Scale: cutoffs are one percentile aggregate (B-1 doubles per column —
  * a bounded driver collect, the BPE-argmax pattern; swap in
  * [[graft.functions.KllQuantileAgg]] cutoffs when a column's per-group
  * value map is itself the bottleneck); the z-value is row-local integer
  * arithmetic inside whole-stage codegen; the only shuffle is the range
  * partition — exactly the one shuffle any clustering rewrite must pay.
  */
object ZOrder {

  /** Exact interpolated per-column cutoffs at fractions 1/B .. (B-1)/B. */
  def quantileCutoffs(df: DataFrame, cols: Seq[String],
                      buckets: Int): Seq[Array[Double]] = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    val fracs = (1 until buckets).map(j => j.toDouble / buckets)
    val aggs = cols.map(c =>
      expr(s"percentile($c, array(${fracs.map(f => s"${f}D").mkString(",")}))")
        .as(s"__q_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => row.getSeq[Double](i).toArray)
  }

  /** Bucket index of `v` against sorted `cutoffs`: #cutoffs <= v, in
    * [0, |cutoffs|]. Row-local HOF over the broadcast literal array. */
  def bucketIndex(v: Column, cutoffs: Array[Double]): Column =
    size(filter(typedLit(cutoffs.toSeq), c => v.cast("double") >= c))

  /** Morton-interleave the per-column bucket indices (each in [0, 2^bits))
    * into one long: bit k of column i lands at position k·n + i. Pure
    * integer Column arithmetic — codegen'd, and bit-for-bit replicable in
    * SQL. */
  def interleave(bucketCols: Seq[Column], bits: Int): Column = {
    val n = bucketCols.length
    val terms = for {
      k <- 0 until bits
      i <- 0 until n
    } yield shiftright(bucketCols(i), k).bitwiseAND(lit(1)).cast("long") *
      lit(1L << (k * n + i))
    terms.reduce(_ + _)
  }

  /** Z-value column for `cols` with `buckets` quantile buckets per column
    * (cutoffs precomputed via [[quantileCutoffs]]). */
  def zvalue(cols: Seq[String], cutoffs: Seq[Array[Double]]): Column = {
    require(cols.nonEmpty && cols.length == cutoffs.length)
    require(cols.length <= 8, "at most 8 z-order columns (64-bit z-value)")
    val buckets = cutoffs.head.length + 1
    val bits = java.lang.Integer.numberOfTrailingZeros(buckets)
    require(bits * cols.length <= 63,
      s"bits($bits) x cols(${cols.length}) exceeds a long")
    interleave(cols.zip(cutoffs).map { case (c, cut) =>
      bucketIndex(col(c), cut) }, bits)
  }

  /** Rewrite `df` into `numPartitions` z-clustered partitions. Appends a
    * `zv` column (callers writing files usually drop it after the write;
    * keeping it costs 8 bytes and documents the layout). */
  def zorderBy(df: DataFrame, cols: Seq[String], buckets: Int,
               numPartitions: Int): DataFrame = {
    val cuts = quantileCutoffs(df, cols, buckets)
    df.withColumn("zv", zvalue(cols, cuts))
      .repartitionByRange(numPartitions, col("zv"))
      .sortWithinPartitions(col("zv"))
  }
}
