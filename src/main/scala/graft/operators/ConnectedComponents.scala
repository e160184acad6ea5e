package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step a
  * dedup pipeline needs after any pair generator (MinHash/SimHash/ngram):
  * near-dup PAIRS become duplicate CLASSES, and keeping one representative
  * per class is what actually deduplicates a corpus.
  *
  * Algorithm: min-label propagation with pointer jumping. Each round does
  * (1) a neighbor step — every node takes the min label over its closed
  * neighborhood — and (2) a shortcut step — comp(v) := comp(comp(v)), which
  * halves label-chain depth. Convergence is O(log diameter) rounds instead
  * of the O(diameter) of plain propagation; each round is a constant number
  * of shuffles (join + min-aggregate), nothing runs on the driver, and
  * lineage is truncated with checkpoints so the plan stays constant-size
  * across iterations (no exponential Catalyst blowup).
  *
  * Scale (100 TB / 1000 executors): labels shuffle as 16-byte (id, comp)
  * rows — independent of document size. The raw edge list is materialized
  * ONCE before the symmetric closure (it is typically an expensive pair
  * generator — a shingle self-join — and is referenced four times in the
  * closure union), the closure is checkpointed once and re-joined per
  * round, and superseded label sets are unpersisted as soon as the next
  * round's labels exist, so cached footprint stays at one edge set plus one
  * label set. Convergence detection rides on label monotonicity: the
  * closed-neighborhood min can never increase a label, so the label sum is
  * strictly decreasing until fixpoint — one cheap scan-aggregate over the
  * just-checkpointed labels per round, no extra join against the previous
  * round. Dedup graphs are near-cliques (diameter <= ~3), so 2-3 rounds in
  * practice; a pathological path graph of length 2^k converges in ~k rounds
  * (asserted in ConnectedComponentsSpec).
  *
  * `reliable = true` switches lineage truncation from `localCheckpoint`
  * (executor-local cache blocks: fast, but a lost executor loses the data
  * and fails the job) to reliable `checkpoint` files — requires
  * `sparkContext.setCheckpointDir` and is the right mode for 1000-executor
  * runs where losing one executor over a multi-round job is routine.
  */
object ConnectedComponents {

  /** Free the storage behind a superseded checkpointed Dataset. After
    * (local)checkpoint the plan is a LogicalRDD; for localCheckpoint the
    * storage is executor cache blocks (unpersist), for reliable checkpoint
    * it is files under the checkpoint dir (delete — Spark only auto-cleans
    * them when spark.cleaner.referenceTracking.cleanCheckpoints is on,
    * which defaults to false, so a multi-round job would otherwise grow
    * one label-set directory per round). */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.getCheckpointFile match {
          case Some(p) =>
            val path = new org.apache.hadoop.fs.Path(p)
            val fs = path.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(path, true)
          case None => r.rdd.unpersist(false)
        }
      case _ => ()
    }

  /** Returns one row per distinct node in `edges`: (id, comp) where comp is
    * the minimum node id reachable from `id`. Node columns must be integral
    * (cast to long). */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 30, reliable: Boolean = false): DataFrame = {
    // Reliable mode must cache before checkpointing: Dataset.checkpoint's
    // file-writing job re-runs the plan from lineage AFTER the materializing
    // action, so an uncached plan computes every join twice. With the cache,
    // the first job populates it and the checkpoint write reads it back;
    // the cache is dropped immediately (the files are the durable copy).
    def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame =
      if (reliable) {
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally df.unpersist(false)
      } else df.localCheckpoint(eager)

    // Materialize the (possibly expensive) pair-generator output once.
    val sym0 = checkpoint(edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst")))
    // Symmetric closure PLUS a self-loop per node: the neighbor step below
    // is then a single join + min-aggregate over the CLOSED neighborhood —
    // no union of a plan with its own derivative (which trips Catalyst's
    // Union constraint rewrite when the shared subtree is a checkpoint).
    val e = checkpoint(sym0
      .union(sym0.select(col("dst").as("src"), col("src").as("dst")))
      .union(sym0.select(col("src"), col("src").as("dst")))
      .union(sym0.select(col("dst").as("src"), col("dst")))
      .distinct())
    release(sym0) // closure is materialized; raw pairs done

    var labels = checkpoint(e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")))

    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // decimal(38,0) keeps the sum exact for any long ids (no wraparound
      // that could fake a fixpoint).
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }

    var prevSum = labelSum(labels)
    var done = prevSum.signum == 0 && labels.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      // (1) min over closed neighborhood (self-loops carry the own label)
      val stepped = e.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("comp").as("comp"))
      // (2) pointer jump: follow comp -> comp(comp). comp is always a node
      // id present in `stepped`, so the join hits unless comp == id (root).
      val jumped = checkpoint(stepped.as("x")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")).as("y"),
          col("x.comp") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.ccomp"), col("x.comp")).as("comp")),
        eager = false)
      // Local mode: single action materializes the lazy checkpoint AND
      // computes the convergence aggregate (reliable mode materialized
      // eagerly above; this is then a cheap scan of the checkpoint files).
      // Labels only ever decrease, so sum unchanged <=> fixpoint.
      val newSum = labelSum(jumped)
      release(labels)
      labels = jumped
      done = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      i += 1
    }
    release(e) // the loop is over; `labels` reads its own checkpoint only
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
        "(graph diameter > 2^maxIter is not plausible — check for label churn)")
    labels
  }

  /** Cluster-representative selection with a QUALITY policy — the missing
    * last step between near-dup pairs and a deduplicated corpus: every
    * document is annotated with its near-dup component, the component's
    * representative (the member maximizing `preferCol`, ties toward the
    * smallest id), the cluster size, and `is_rep`. Docs in no pair form
    * their own singleton component. Callers keep `is_rep` rows.
    *
    * Scale design: components() runs on the PAIRS (a sliver of the corpus
    * at realistic duplicate rates); both the (id, comp) labels and the
    * per-component best table are small, so their joins onto the corpus
    * broadcast under AQE — the documents themselves never shuffle, exactly
    * like exactDedupKeepBest. */
  def representatives(docs: DataFrame, edges: DataFrame, idCol: String,
                      aCol: String, bCol: String, preferCol: Column,
                      maxIter: Int = 30, reliable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    // component / rep_id / cluster_size / is_rep are the documented OUTPUT
    // columns — refuse a clash loudly rather than silently shadowing.
    val reserved = Seq("component", "rep_id", "cluster_size", "is_rep")
      .filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before representatives")
    // Collision-free temp names: dropping literal "id"/"comp" would also
    // drop a same-named caller column (drop-by-name removes every match).
    var pref = "__pref"; var cid = "__cc_id"; var ccomp = "__cc_comp"
    while (docs.columns.contains(pref)) pref += "_"
    while (docs.columns.contains(cid)) cid += "_"
    while (docs.columns.contains(ccomp)) ccomp += "_"
    val comps = components(edges, aCol, bCol, maxIter, reliable)
      .select(col("id").as(cid), col("comp").as(ccomp))
    // only clustered docs participate in the best-of-group aggregate
    val clustered = docs.withColumn(pref, preferCol)
      .join(comps, docs(idCol) === col(cid), "inner")
      .select(col(ccomp), col(idCol), col(pref))
    // Representative = max preference, ties toward the SMALLEST id — found
    // with a two-pass max-then-min (per-component max pref, then min id
    // among the rows achieving it) instead of max_by over struct(pref, -id):
    // unary minus on the id column broke for string/UUID ids even though
    // everything else here supports them. Null-safe <=> keeps the all-null-
    // preference component working (max() yields null, every row matches).
    val sizes = clustered.groupBy(col(ccomp))
      .agg(max(col(pref)).as(pref + "_max"), count(lit(1)).as("cluster_size"))
    val best = clustered.join(sizes, ccomp)
      .filter(col(pref) <=> col(pref + "_max"))
      .groupBy(col(ccomp))
      .agg(min(col(idCol)).as("rep_id"), first(col("cluster_size")).as("cluster_size"))
    docs.join(comps, docs(idCol) === col(cid), "left")
      .withColumn("component", coalesce(col(ccomp), docs(idCol)))
      .drop(cid, ccomp)
      .join(best.withColumnRenamed(ccomp, "component"), Seq("component"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("is_rep", col(idCol) === col("rep_id"))
  }
}
