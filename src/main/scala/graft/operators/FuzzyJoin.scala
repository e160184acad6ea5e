package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JaroWinklerSim.jaro_winkler

/** Jaro-Winkler fuzzy matching — the record-linkage tier next to the
  * edit-distance PassJoin in [[Dedup.editDistancePairs]]: JW is
  * length-normalized and front-weighted, the standard metric for
  * names/titles/short strings.
  *
  * Unlike edit distance (whose partition signatures give EXACT
  * candidate-complete blocking), a JW threshold admits no such filter —
  * two strings differing at the first character can still score high. So
  * the operator makes blocking EXPLICIT: the caller supplies a blocking
  * key (first token, phonetic key, sorted-token prefix...), pairs are
  * exact-scored WITHIN blocks, and the contract is "all pairs sharing a
  * block with jw >= threshold" — deterministic and oracle-replicable,
  * with recall against unblocked all-pairs governed by the caller's key
  * (pass a constant to get the exact quadratic baseline on small data).
  *
  * 100 TB design: the self-join is an equi-join on the block key (no
  * cartesian anywhere); within a block the pair cost is QUADRATIC in the
  * block size — the caller's key choice is the knob, exactly as in
  * production record linkage: the key's cardinality must GROW with the
  * data (sorted-neighborhood windows, multi-token keys, phonetic+length
  * composites), or block growth turns linear data growth into quadratic
  * pair growth. The probe side is spread across shuffle partitions before
  * the (typically broadcast) join — a small keyed table would otherwise
  * expand its millions of candidate pairs on 1-2 tasks (measured 12x).
  * The JW kernel is a codegen expression with an allocation-free ASCII
  * fast path (thread-local match-flag scratch), so scoring stays inside
  * whole-stage codegen at ~100ns/pair. */
object FuzzyJoin {

  /** (id_a, id_b, s_a, s_b, sim) for distinct same-block pairs (id_a <
    * id_b) with jaro_winkler(s_a, s_b) >= threshold; sim rounded 6dp.
    *
    * NULL handling: rows whose string or block key is NULL take part in no
    * pair (similarity to nothing is undefined); they are filtered out
    * explicitly up front rather than left to the equi-join's null-drop. */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
                       blockKey: Column, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"), blockKey.as("k"))
      .filter(col("s").isNotNull && col("k").isNotNull)
    // The build side broadcasts (blocking only makes sense when the keyed
    // table is broadcastable or the blocks are small); the PROBE side
    // inherits its scan's partitioning, and a small parquet scan is 1-2
    // partitions — without an explicit spread the whole pair expansion
    // would run on 1-2 tasks (the documented broadcast-join fan-out trap).
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    base.repartition(parts).as("a").join(base.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"),
        jaro_winkler(col("a.s"), col("b.s")).as("jw"))
      .where(col("jw") >= threshold)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
        round(col("jw"), 6).as("sim"))
  }

  /** First whitespace token, lowercased — the simplest useful block key
    * for "<adjective> <noun>"-style names. */
  def firstTokenKey(strCol: String): Column =
    lower(split(trim(col(strCol)), "\\s+").getItem(0))

  /** Sorted-neighborhood blocking (Hernandez & Stolfo 1995) — the
    * LINEAR-cost strategy the fixed-key caveat above demands: sort the
    * corpus by a string key, score each record only against the next
    * `windowSize` records in sort order. Pair count = N·w regardless of
    * how the data grows, so linear data growth stays linear pair growth
    * (the windowed analog of a key whose cardinality scales with N).
    *
    * Global rank WITHOUT a partition-less window (the [[Sharding]]
    * pattern): rows bucket by the first `bucketLen` chars of the sort
    * key — a PREFIX of the sort order, so bucket-major order IS global
    * order and rank = lower-bucket count + within-bucket row_number; the
    * only single-partition step is the tiny per-bucket offset cumsum.
    * Neighbor candidates come from two equi-joins on ⌊rank/w⌋ (own and
    * next window-bucket) — no range or nested-loop join anywhere.
    *
    * Returns (id_a, id_b, s_a, s_b, sim) with id_a < id_b, exact JW
    * within the window contract, sim rounded 6dp.
    *
    * NULL handling: rows whose string or sort key is NULL take part in no
    * pair — a NULL key has no position in the sort order; they are
    * filtered out explicitly up front rather than left to the
    * bucket/offset equi-joins' null-drop. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
                              sortKeyCol: String, windowSize: Int,
                              threshold: Double,
                              bucketLen: Int = 2): DataFrame = {
    require(windowSize >= 1 && threshold > 0 && threshold <= 1)
    val base = df.select(col(idCol).cast("long").as("id"),
      col(strCol).as("s"), col(sortKeyCol).cast("string").as("sk"))
      .filter(col("s").isNotNull && col("sk").isNotNull)
    val rows = base.withColumn("bkt_", substring(col("sk"), 1, bucketLen))
    val offsets = rows.groupBy(col("bkt_")).count()
      .withColumn("off_", coalesce(sum(col("count")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bkt_"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("count")
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt_")).orderBy(col("sk"), col("id"))
    val ranked = rows.join(broadcast(offsets), Seq("bkt_"))
      .withColumn("rn", col("off_") + row_number().over(local))
      .select(col("id"), col("s"), col("rn"))
      .withColumn("wb", floor(col("rn") / windowSize))
    def neighbors(b: DataFrame): DataFrame =
      ranked.as("a").join(b.as("b"),
        col("a.wb") === col("b.wb") &&
          col("b.rn") > col("a.rn") && col("b.rn") <= col("a.rn") + windowSize)
    val cands = neighbors(ranked)
      .unionAll(neighbors(ranked.withColumn("wb", col("wb") - 1)))
    cands
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("a.s")).otherwise(col("b.s")).as("s_a"),
        when(col("a.id") < col("b.id"), col("b.s")).otherwise(col("a.s")).as("s_b"),
        jaro_winkler(col("a.s"), col("b.s")).as("jw"))
      .where(col("jw") >= threshold)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
        round(col("jw"), 6).as("sim"))
  }
}
