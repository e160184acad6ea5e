package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an arbitrary weighted directed edge table — the
  * graph-centrality operator a corpus pipeline uses to weight sources by
  * link authority (OpenWebText/CCNet-style "quality via incoming links")
  * and an analytics engine uses for influence ranking over any relation.
  *
  * Semantics (Page et al. 1999, with the standard dangling-mass fix):
  * fixed `iters` power iterations of
  * {{{ r'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} r(u)·w(u,v)/outW(u) + D/N ) }}}
  * where D = Σ r(u) over dangling nodes (no out-edges) — mass is conserved
  * exactly (Σ r = 1 every iteration), so ranks are comparable across
  * graphs. Node set = nodes appearing in the edge table (as src or dst).
  * Deterministic: fixed iteration count, no convergence-threshold
  * data-dependence, so the result is exactly replicable (the oracle
  * unrolls the same recurrence in SQL).
  *
  * 100 TB design: the edge table is normalized ONCE — e0 is
  * hash(src)-partitioned and cached, so the out-weight groupBy and the
  * normalization join run exchange-free on top of it and the checkpoint
  * inherits the partitioning. The per-iteration cost is joining the
  * (|V|-sized) rank vector against the cached edges (the rank side's
  * alias-aware partitioning usually makes this exchange-free too) and one
  * groupBy(dst): exactly the shuffles a distributed power iteration must
  * pay. The rank vector is persisted (blocks released as soon as
  * superseded) every `checkpointEvery` rounds for dangling-free graphs,
  * every round when a dangling term exists (its 1-row mass aggregate folds
  * into the same job as the rank update — never a separate driver-side
  * action). All materialization uses persist(), not localCheckpoint: an
  * InMemoryRelation preserves outputPartitioning, a checkpoint's
  * LogicalRDD forgets it and re-shuffles the cached table on every use.
  */
object PageRank {

  // Caches pinned by each run(), weakly keyed by the returned frame: the
  // result is lazy, so the |E|/|V|-sized persists MUST stay resident until
  // the caller's terminal action — unpersisting inside run() would force
  // the whole graph to recompute uncached. release() is the explicit
  // post-action drop; if the caller instead just drops the result, the
  // weak entry is collected with it (blocks then remain until context
  // cleanup or a session-level spark.catalog.clearCache(), which is what
  // graft.Bench does between queries).
  private val pinned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]())

  /** Drop the caches pinned by the [[run]] that returned `result`. Call
    * AFTER the action that consumed `result` completes; the frame remains
    * valid afterwards but recomputes from source if re-executed. */
  def release(result: DataFrame): Unit = {
    val cs = pinned.remove(result)
    if (cs != null) cs.foreach { df =>
      df.queryExecution.logical match {
        case _: org.apache.spark.sql.execution.LogicalRDD =>
          ConnectedComponents.release(df) // a localCheckpoint cut
        case _ => df.unpersist(false)
      }
    }
  }

  /** (node, rank) for every node in `edges`. Edge weights must be
    * positive; multi-edges are summed.
    *
    * `personalization`: optional (node) or (node, weight) seed frame —
    * switches to PERSONALIZED PageRank: the teleport distribution t
    * (uniform-over-V in the standard form) becomes the normalized seed
    * weights, i.e. r'(v) = (1-d)·t(v) + d·(Σ contrib + D·t(v)). Relevance
    * then concentrates around the seeds — "importance FROM this set's
    * point of view" (topic-sensitive PageRank, Haveliwala 2002). The seed
    * frame is |seeds|-sized and joins once into the node table. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          weightCol: Option[String] = None, iters: Int = 10,
          damping: Double = 0.85, numPartitions: Int = 0,
          checkpointEvery: Int = 5,
          personalization: Option[DataFrame] = None,
          edgesUnique: Boolean = false): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val parts =
      if (numPartitions > 0) numPartitions
      else edges.sparkSession.sessionState.conf.numShufflePartitions

    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    // Materialize the (often expensive — a pair generator or self-join)
    // input ONCE: nodes, out-weights and normalized edges all re-derive
    // from it, and without the materialization each derivation would
    // recompute the full upstream plan (measured 4-5x the whole edge
    // construction). persist(), NOT localCheckpoint: an InMemoryRelation
    // preserves the cached plan's outputPartitioning/outputOrdering, so
    // every downstream src/node-keyed join and groupBy plans exchange-free
    // on top of it — a checkpoint's LogicalRDD forgets the partitioning
    // and re-shuffled the |E|-sized table EVERY iteration (measured: the
    // whole per-iteration cost was that exchange).
    import org.apache.spark.storage.StorageLevel
    val eRaw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), w.as("w"))
    // edgesUnique: the caller warrants one row per (src, dst) — commonly
    // true when the edge table IS an aggregate (as in co-occurrence
    // graphs), where re-summing would pay a full |E| exchange + aggregate
    // for nothing. Default (false) sums multi-edges as documented.
    val eDedup =
      if (edgesUnique) eRaw
      else eRaw.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val e0 = eDedup
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // node table carries an isSrc flag, so dangling nodes (no out-edges)
    // are a FILTER of it — no anti-join, and a single aggregate over it
    // yields |V| and the dangling count in one job (which also fills the
    // e0 and nodes caches). groupBy(node) output is already hash(node)
    // partitioned — no explicit repartition needed.
    val nodes = e0.select(col("src").as("node"), lit(1).as("isSrc"))
      .union(e0.select(col("dst").as("node"), lit(0).as("isSrc")))
      .groupBy(col("node")).agg(max(col("isSrc")).as("isSrc"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cnts = nodes.agg(count(lit(1)),
      count(when(col("isSrc") === 0, lit(1)))).head()
    val n = cnts.getLong(0).toDouble
    val hasDangling = cnts.getLong(1) > 0
    val dangling = nodes.filter(col("isSrc") === 0).select(col("node"))

    // normalized edges: share = w / outW(src). e0 is hash(src)-partitioned,
    // so the out-weight groupBy AND the normalization join run
    // exchange-free on top of it, and the persisted result keeps that
    // partitioning for every iteration's rank join to reuse. Filled
    // cache-to-cache, then the raw edge cache is released — only ONE
    // |E|-sized table stays resident through the iterations.
    //
    // ITERATION WIDTH is derived from the MEASURED edge count, not the
    // session shuffle width: every iteration schedules 2-3 stages over
    // this table's partitions, so a small graph at full conf width pays
    // iters × parts × per-task dispatch for near-empty tasks (r17: the
    // 32-wide iterations anti-scaled 8→32 cores on the bench box, c8
    // 4.4 s vs c32 14.2 s). ~256k edge rows per task (a few MB) keeps
    // tasks meaningfully sized; a corpus-scale graph clamps to the
    // session width, where the one narrowing repartition below is
    // SKIPPED — no extra |E| exchange is ever paid at scale. The count
    // reads the just-filled cache.
    val mRows = e0.count()
    val itParts = math.max(1L, math.min(parts.toLong, mRows / 262144L + 1L)).toInt
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val normBase = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
    val normEdges = (if (itParts < parts)
        normBase.repartition(itParts, col("src"))
      else normBase)
      .persist(StorageLevel.MEMORY_AND_DISK)
    normEdges.count()
    e0.unpersist(false)

    // teleport distribution t: uniform 1/|V|, or the normalized seed
    // weights (over seeds ∩ V) in personalized mode. The seed frame is
    // tiny — it broadcasts into one join, materialized once.
    val nodeIds = nodes.select(col("node"))
    var seedCut: DataFrame = null // personalized mode's |seeds| checkpoint
    val nodesT = personalization match {
      case None => nodeIds.withColumn("t", lit(1.0 / n))
      case Some(p) =>
        val cs = p.columns
        val seeds0 =
          if (cs.length >= 2)
            p.select(col(cs(0)).cast("long").as("node"),
              col(cs(1)).cast("double").as("sw"))
          else p.select(col(cs(0)).cast("long").as("node"), lit(1.0).as("sw"))
        val seedsInV = seeds0.groupBy(col("node")).agg(sum(col("sw")).as("sw"))
          .join(nodeIds, "node")
          .localCheckpoint(true)
        seedCut = seedsInV
        val tot = seedsInV.agg(sum(col("sw"))).head() match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getDouble(0)
        }
        require(tot > 0,
          "personalization seeds have no positive mass on graph nodes")
        // persist (not checkpoint) so the broadcast-joined frame keeps
        // nodes' hash(node) partitioning for the per-iteration rank join
        nodeIds.join(broadcast(seedsInV), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("sw") / lit(tot), lit(0.0)).as("t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    var ranks = nodesT.select(col("node"), col("t").as("rank"))
    var prev: DataFrame = null
    var i = 0
    while (i < iters) {
      // shuffle_hash hint on the |V|-sized rank side: a sort-merge join
      // would re-SORT the cached |E| table every iteration; SHJ streams it
      // in cache order and builds the (small) rank hash table per
      // partition. The rank side is explicitly repartitioned to the edge
      // cache's itParts width — without it the planner aligns the join at
      // the rank side's conf-width partitioning and re-exchanges the
      // |E|-sized cache EVERY iteration (measured: 8.5 MB shuffled per
      // round); this way the |V|-sized side pays the (tiny) exchange it
      // paid anyway and the edge side stays exchange-free.
      val contrib = normEdges
        .join(ranks.withColumnRenamed("node", "src")
          .repartition(itParts, col("src")).hint("shuffle_hash"),
          "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("c"))
      // Dangling mass folds into the SAME job as the rank update: a 1-row
      // aggregate frame cross-joined in (the documented single-row-scalar
      // BNLJ shape) instead of a per-round driver-side action — the old
      // `.head()` re-ran up to checkpointEvery iterations of lineage just
      // to read one double.
      val next =
        if (!hasDangling)
          nodesT.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(1.0 - damping) * col("t") +
                lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        else {
          val dmDf = ranks.join(dangling, "node")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
          nodesT.join(contrib, Seq("node"), "left")
            .crossJoin(dmDf)
            .select(col("node"),
              (lit(1.0 - damping) * col("t") +
                lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dm") * col("t")))
                .as("rank"))
        }
      // Dangling graphs cut the rank vector EVERY round: `ranks` feeds
      // both the contrib join and the dm aggregate, so un-cut lineage
      // would double per iteration (2^window plan growth). One shallow
      // |V|-sized job — the same count of actions the old dm `.head()`
      // paid, without the deep-lineage re-runs. Dangling-free graphs keep
      // the lazy `checkpointEvery` schedule, and the LAST iteration is
      // never forced — the caller's action materializes it. The rank
      // vector uses localCheckpoint, NOT persist: only a checkpoint cuts
      // logical lineage (a persisted frame's plan keeps growing per
      // iteration until explain/canonicalization blows up); the
      // partitioning it forgets costs one |V|-sized exchange per
      // iteration, noise next to the preserved |E|-side partitioning.
      val cutNow = i != iters - 1 &&
        (if (hasDangling) true else (i + 1) % checkpointEvery == 0)
      ranks =
        if (cutNow) {
          val cut = next.localCheckpoint(true)
          if (prev != null) ConnectedComponents.release(prev)
          prev = cut
          cut
        } else next
      i += 1
    }
    // register this run's resident caches for a post-action release():
    // the two (or three, personalized) persisted tables plus the last
    // surviving lineage cut that the returned frame still reads from.
    val pins = Seq(nodes, normEdges) ++
      (if (personalization.isDefined) Seq(nodesT) else Nil) ++
      Option(seedCut).toSeq ++ Option(prev).toSeq
    pinned.put(ranks, pins)
    ranks
  }
}
