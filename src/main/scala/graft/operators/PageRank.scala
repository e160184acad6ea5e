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
  * 100 TB design: the edge table is normalized ONCE (one groupBy + one
  * join), hash-partitioned on `src` and cached — the per-iteration cost is
  * joining the (|V|-sized) rank vector against it and one groupBy(dst):
  * exactly the two shuffles a distributed power iteration must pay, with
  * the big |E| side's partitioning reused from cache. Lineage is cut with
  * `localCheckpoint` every `checkpointEvery` rounds (the
  * [[ConnectedComponents]] pattern — executor-cache blocks released as
  * soon as superseded). The dangling term costs one scalar aggregate per
  * round and is SKIPPED entirely (zero extra jobs) when the graph has no
  * dangling nodes.
  */
object PageRank {

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
          personalization: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1)
    val parts =
      if (numPartitions > 0) numPartitions
      else edges.sparkSession.sessionState.conf.numShufflePartitions

    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    // Materialize the (often expensive — a pair generator or self-join)
    // input ONCE: nodes, out-weights and normalized edges all re-derive
    // from it, and without the checkpoint each derivation would recompute
    // the full upstream plan (measured 4-5x the whole edge construction).
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .repartition(parts, col("src"))
      .localCheckpoint(true)

    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .repartition(parts, col("node"))
      .localCheckpoint(true)
    val n = nodes.count().toDouble

    // normalized edges: share = w / outW(src); partitioned by src so every
    // iteration's rank join co-locates against the cached big side
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val normEdges = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .repartition(parts, col("src"))
      .localCheckpoint(true)

    // dangling nodes (no out-edges): detected by comparing the distinct
    // src count against |V| (one job); the table itself is only
    // materialized when the graph actually has dangling nodes
    val nSrc = normEdges.select(col("src")).distinct().count()
    val hasDangling = nSrc < n.toLong
    val dangling =
      if (!hasDangling) null
      else nodes.join(normEdges.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti")
        .localCheckpoint(true)
    ConnectedComponents.release(e0) // all derivations are materialized

    // teleport distribution t: uniform 1/|V|, or the normalized seed
    // weights (over seeds ∩ V) in personalized mode. The seed frame is
    // tiny — it broadcasts into one join, materialized once.
    val nodesT = personalization match {
      case None => nodes.withColumn("t", lit(1.0 / n))
      case Some(p) =>
        val cs = p.columns
        val seeds0 =
          if (cs.length >= 2)
            p.select(col(cs(0)).cast("long").as("node"),
              col(cs(1)).cast("double").as("sw"))
          else p.select(col(cs(0)).cast("long").as("node"), lit(1.0).as("sw"))
        val seedsInV = seeds0.groupBy(col("node")).agg(sum(col("sw")).as("sw"))
          .join(nodes, "node")
          .localCheckpoint(true)
        val tot = seedsInV.agg(sum(col("sw"))).head() match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getDouble(0)
        }
        require(tot > 0,
          "personalization seeds have no positive mass on graph nodes")
        nodes.join(broadcast(seedsInV), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("sw") / lit(tot), lit(0.0)).as("t"))
          .localCheckpoint(true)
    }

    var ranks = nodesT.select(col("node"), col("t").as("rank"))
    var prev: DataFrame = null
    var i = 0
    while (i < iters) {
      val dm =
        if (!hasDangling) 0.0
        else ranks.join(dangling, "node").agg(sum(col("rank"))).head() match {
          case r if r.isNullAt(0) => 0.0
          case r => r.getDouble(0)
        }
      val contrib = normEdges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("share")).as("c"))
      val next = nodesT.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("t") +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(dm) * col("t")))
            .as("rank"))
      // no forced checkpoint on the LAST iteration: the caller's action
      // materializes the (<= checkpointEvery deep) remaining lineage —
      // forcing one here would pay a whole extra materialization
      ranks =
        if ((i + 1) % checkpointEvery == 0 && i != iters - 1) {
          val cut = next.localCheckpoint(true)
          if (prev != null) ConnectedComponents.release(prev)
          prev = cut
          cut
        } else next
      i += 1
    }
    ranks
  }
}
