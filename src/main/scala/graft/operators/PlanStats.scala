package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-lifetime memoized `count()` per canonicalized logical plan.
  *
  * Several operators need ONE scalar — the corpus row count — purely to
  * SIZE something (a training-sample ratio, a tile/block grid, a
  * repartition width), and operators are routinely stacked on the same
  * corpus in one pipeline (pqTopK + buildIvfPqIndex + cosineNeardupPairs
  * over one embeddings table; bench reps re-invoke the same gate). Memoize
  * by the analyzed plan's canonical form so the count job runs once per
  * distinct input per session. On an immutable corpus reuse is exact; on
  * a mutated one a stale count merely shifts a partition/sample SIZE,
  * never a result value — every consumer uses it only for sizing. */
private[operators] object PlanStats {
  private val cache =
    new java.util.LinkedHashMap[LogicalPlan, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, java.lang.Long]): Boolean =
        size() > 64
    }

  def memoizedCount(df: DataFrame): Long = {
    val key = df.queryExecution.analyzed.canonicalized
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit.longValue()
    else {
      val n = df.count()
      cache.synchronized(cache.put(key, java.lang.Long.valueOf(n)))
      n
    }
  }
}
