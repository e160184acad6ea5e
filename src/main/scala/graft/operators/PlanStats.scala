package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-lifetime memoized `count()` per canonicalized logical plan,
  * for SIZING decisions only (see [[sizingCount]]).
  *
  * Several operators need ONE scalar — the corpus row count — purely to
  * SIZE something (a training-sample ratio, a tile/block grid, a
  * repartition width), and operators are routinely stacked on the same
  * corpus in one pipeline (pqTopK + buildIvfPqIndex + cosineNeardupPairs
  * over one embeddings table; bench reps re-invoke the same gate). Memoize
  * by the analyzed plan's canonical form so the count job runs once per
  * distinct input per session. */
private[operators] object PlanStats {
  private val cache =
    new java.util.LinkedHashMap[LogicalPlan, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, java.lang.Long]): Boolean =
        size() > 64
    }

  /** Possibly-STALE row count of `df` — NEVER use the value semantically.
    *
    * Contract: the cache is session-lifetime and not invalidated when the
    * underlying files change, so a pipeline that overwrites and re-reads
    * the same path (a streaming ingest loop) can observe the PREVIOUS
    * count. That is safe for every existing consumer because a stale
    * count only shifts a partition/sample/tile SIZE, never a result
    * value. A caller that needs the true current count must call
    * `df.count()` directly, or [[invalidate]] first (long-lived ingestion
    * loops that re-derive sizing per epoch). */
  def sizingCount(df: DataFrame): Long = {
    val key = df.queryExecution.analyzed.canonicalized
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit.longValue()
    else {
      val n = df.count()
      cache.synchronized(cache.put(key, java.lang.Long.valueOf(n)))
      n
    }
  }

  /** Drop every memoized count — the refresh hook for long-lived
    * ingestion loops whose inputs mutate between sizing epochs. */
  def invalidate(): Unit = cache.synchronized(cache.clear())

  /** Unlock parallelism for a CPU-dense kernel pass when the input scan is
    * a handful of small files: byte-based split sizing gives a sub-MB
    * parquet ONE partition, and the whole kernel pass then runs
    * single-task. Guarded three ways so the probe itself never costs
    * anything: (1) only scan-shaped plans (leaf/project/filter/union) are
    * probed — materializing `.rdd` under AQE on a plan WITH exchanges
    * executes the upstream query stages, so the probe would run the query
    * once before the real pass (r17 ADVICE), and shuffle-shaped inputs
    * already arrive at shuffle-partition width; (2) a size floor — a
    * sub-128 KB input (e.g. a training fixture) finishes serially faster
    * than the repartition round-trip it would buy; (3) the actual scan
    * parallelism, so a corpus-scale input (thousands of splits) never pays
    * the extra exchange. */
  private[graft] def spreadForKernel(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, SubqueryAlias, Union}
    val p = df.sparkSession.sparkContext.defaultParallelism
    def scanShaped(pl: LogicalPlan): Boolean = pl match {
      case _: LeafNode => true
      case _: Project | _: Filter | _: SubqueryAlias =>
        scanShaped(pl.children.head)
      case u: Union => u.children.forall(scanShaped)
      case _ => false
    }
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= 131072 && scanShaped(df.queryExecution.logical) &&
        df.rdd.getNumPartitions * 2 < p) df.repartition(p) else df
  }
}
