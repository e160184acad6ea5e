package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation. Both variants derive
  * membership from a content hash of a key column, never from RNG state —
  * the same rows are selected on any cluster size, partitioning, retry, or
  * engine (md5 is everywhere), unlike df.sample whose output depends on seed
  * AND partition layout.
  */
object Sampling {

  private def hashKey(keyCol: String): Column =
    md5(col(keyCol).cast("string"))

  /** Keep rows whose md5(key) falls in the first `fraction` of the hash
    * space (lexicographic compare on lowercase hex = numeric compare on the
    * first 8 nibbles). Approximate per-partition counts, exact expectation;
    * no shuffle, no window — the scale path for 100 TB strata. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    if (fraction >= 1.0) df
    else {
      val thr = f"${(fraction * (1L << 32)).toLong}%08x"
      df.filter(hashKey(keyCol) < lit(thr))
    }
  }

  /** Exactly ceil(fraction * n) rows per stratum: rank rows in each stratum
    * by content hash and keep the first ceil(f*n). Deterministic AND exact,
    * at the cost of a per-stratum sort (one window shuffle). Skew note: each
    * stratum sorts within its partitions via Spark's window exec — for very
    * large strata (100 TB, few strata) prefer deterministicSample, which
    * needs no ordering. */
  def stratifiedExact(df: DataFrame, strataCol: String, keyCol: String,
                      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(keyCol), col(keyCol))
    val cw = Window.partitionBy(col(strataCol))
    // Collision-free temp names: a fixed "__rk" would shadow (and then drop)
    // a same-named input column, silently corrupting the output schema.
    var rk = "__rk"
    var n = "__n"
    while (df.columns.contains(rk)) rk += "_"
    while (df.columns.contains(n)) n += "_"
    df.withColumn(rk, row_number().over(w))
      .withColumn(n, count(lit(1)).over(cw))
      .filter(col(rk) <= ceil(col(n) * fraction))
      .drop(rk, n)
  }

  /** Exactly `k` deterministic exemplar rows per group — the "show me a
    * few examples from every bucket" primitive behind corpus datasheets
    * and quality audits. Selection is by content hash (md5 of the key),
    * so it is unbiased-looking, stable across cluster layouts and reruns,
    * and exactly SQL-replicable; output carries the pick's rank (1..k).
    * One window shuffle keyed by the group — same shape (and same skew
    * note) as stratifiedExact. */
  def exemplars(df: DataFrame, groupCol: String, keyCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashKey(keyCol), col(keyCol))
    var rk = "exemplar_rank"
    require(!df.columns.contains(rk),
      s"input already has a '$rk' column — rename it first")
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= k)
  }

  /** Mixture resampling — construct a training mix: down-sample each
    * stratum (source/domain/language) so its share of the sampled corpus's
    * total weight (tokens, bytes, ...) approaches `targetShare` of
    * `totalBudget`:  frac_s = min(1, share_s x budget / weight_s).
    * A stratum can only be down-sampled (no duplication); strata missing
    * from `targetShare` are dropped.
    *
    * Membership is deterministic content-hash thresholding, so the same
    * rows are picked on any cluster size, retry, or engine — and the hash
    * arithmetic (md5 hex vs a per-stratum %08x threshold) is replicable in
    * ANSI SQL for the oracle.
    *
    * Scale: one tiny per-stratum aggregate (S rows), a broadcast join of
    * those S fraction rows, and a row-local hash filter. The corpus itself
    * never shuffles. */
  def mixtureSample(df: DataFrame, strataCol: String, keyCol: String,
                    weight: Column, targetShare: Map[String, Double],
                    totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget $totalBudget")
    require(targetShare.values.forall(_ >= 0), "negative target share")
    val spark = df.sparkSession
    import spark.implicits._
    var wcol = "__w"; var fcol = "__frac"; var tcol = "__thr"
    while (df.columns.contains(wcol)) wcol += "_"
    while (df.columns.contains(fcol)) fcol += "_"
    while (df.columns.contains(tcol)) tcol += "_"
    val shares = targetShare.toSeq.toDF(strataCol, fcol + "s")
    val fracs = df.withColumn(wcol, weight.cast("double"))
      .groupBy(col(strataCol)).agg(sum(col(wcol)).as(wcol))
      .join(shares, strataCol)
      .withColumn(fcol,
        least(lit(1.0), col(fcol + "s") * totalBudget / col(wcol)))
      .select(col(strataCol), col(fcol))
    df.join(broadcast(fracs), strataCol)
      .withColumn(tcol, format_string("%08x",
        floor(col(fcol) * 4294967296L).cast("bigint")))
      .filter(col(fcol) >= 1.0 || hashKey(keyCol) < col(tcol))
      .drop(fcol, tcol)
  }

  /** Leakage-safe train/holdout split: near-duplicate documents must land
    * on the SAME side (a holdout doc whose near-copy sits in training data
    * leaks the eval), so membership is decided by hashing the near-dup
    * COMPONENT id, not the document id. Docs in no pair split
    * independently (their component is themselves).
    *
    * Output: the input plus `component` and `split` ('train' | 'holdout').
    * Deterministic (md5 thresholding, like the samplers) and replicable in
    * SQL. Scale: CC runs on the pairs only; the label join broadcasts;
    * the split decision is row-local. */
  def leakageSafeSplit(docs: DataFrame, edges: DataFrame, idCol: String,
                       aCol: String, bCol: String,
                       holdoutFraction: Double): DataFrame = {
    require(holdoutFraction >= 0.0 && holdoutFraction <= 1.0,
      s"holdoutFraction $holdoutFraction")
    // component / split are the documented OUTPUT columns — refuse a clash
    // loudly rather than silently shadowing a caller column.
    val reserved = Seq("component", "split").filter(docs.columns.contains)
    require(reserved.isEmpty,
      s"docs already has output column(s) ${reserved.mkString(", ")} — " +
        "rename them before leakageSafeSplit")
    // Alias the components frame to collision-free temp names: dropping the
    // literal names "id"/"comp" would remove a SAME-NAMED caller column too
    // (Spark drop-by-name drops every match).
    var cid = "__cc_id"; var ccomp = "__cc_comp"
    while (docs.columns.contains(cid)) cid += "_"
    while (docs.columns.contains(ccomp)) ccomp += "_"
    val comps = ConnectedComponents.components(edges, aCol, bCol)
      .select(col("id").as(cid), col("comp").as(ccomp))
    val thr = f"${(holdoutFraction * (1L << 32)).toLong}%08x"
    docs.join(comps, docs(idCol) === col(cid), "left")
      .withColumn("component", coalesce(col(ccomp), docs(idCol)))
      .drop(cid, ccomp)
      .withColumn("split",
        // fraction 1.0 yields a 9-char hex threshold that compares SMALLER
        // than any md5 lexicographically — handle it explicitly
        when(lit(holdoutFraction) >= 1.0
            || md5(col("component").cast("string")) < lit(thr), "holdout")
          .otherwise("train"))
  }

  /** Diversity (coverage) sampling over an embedding corpus: partition the
    * semantic space into `numCells` deterministic-centroid cells (the same
    * integer-hash centroid pick and argmax-cosine assignment as
    * `Dedup.semanticNeardupPairs` — pure integer/double arithmetic a SQL
    * oracle replicates exactly), then keep `perCell` deterministic
    * exemplars per cell by md5(id). Equal-per-cell selection is the
    * point: a uniform random sample mirrors the corpus density and
    * oversamples dense regions; this covers the embedding space — the
    * data-curation "semantic coverage" primitive.
    *
    * Output: (id, cell, pick_rank) for the selected rows.
    *
    * Scale: centroids are a numCells-row broadcast; assignment is one
    * corpus pass; the pick is one window partitioned by cell. */
  def diversitySample(emb: DataFrame, idCol: String, vecCol: String,
                      numCells: Int, perCell: Int): DataFrame = {
    require(numCells >= 1 && perCell >= 1, s"bad ($numCells, $perCell)")
    val v = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Dedup.l2norm(col("v")))
    // low-31-bit multiplicative hash (overflow-safe at any id scale; see
    // semanticNeardupPairs)
    val hkey = pmod(pmod(col("id").cast("long"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    val cents = v.orderBy(hkey, col("id")).limit(numCells)
      .select(col("id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy(col("id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val assigned = v.crossJoin(broadcast(cents))
      .withColumn("csim", Dedup.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("id"), col("cent_id").as("cell"))
    val wPick = Window.partitionBy(col("cell"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    assigned.withColumn("pick_rank", row_number().over(wPick))
      .filter(col("pick_rank") <= perCell)
      .select(col("id"), col("cell"), col("pick_rank"))
  }

  /** Per-group cap: keep at most `n` rows per group, ranked by the given
    * order columns (callers append a unique id as the final tiebreak to
    * make selection deterministic) — the C4-style per-domain cap that stops
    * a single mega-site from dominating a web corpus.
    *
    * Output: the input columns plus `cap_rank` (1-based rank within the
    * group) for the kept rows only.
    *
    * Scale: one window PARTITIONED by the group key — each group sorts
    * locally after the hash partition, nothing global. Heavily-skewed
    * groups (the mega-domain) are exactly the rows the cap discards, and
    * the sort within a group is O(group) — for pathological single-group
    * skew, pre-aggregate with a per-partition top-n (TakeOrdered shape)
    * before the window; at web-corpus domain cardinalities the plain
    * window is the right default. */
  def capPerGroup(df: DataFrame, groupCol: String, n: Int,
                  orderCols: Seq[Column]): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= n)
  }

  /** Temperature-scaled source mixing weights — the standard multilingual /
    * multi-source sampling recipe (sample source i with probability
    * proportional to its size raised to alpha < 1, boosting small sources;
    * used by multilingual BERT, XLM-R, LLaMA-style data recipes).
    *
    *   w_i = c_i^alpha / sum_j c_j^alpha
    *   eff_epochs_i = (budget · w_i) / c_i   — how many times source i's
    *   tokens repeat when `budget` tokens are drawn under these weights
    *   (budget defaults to the corpus total).
    *
    * Scale: one per-stratum aggregate (|sources| rows), then a broadcast
    * single-row scalar frame (the tf-idf/BM25 pattern — the BNLJ is one
    * in-memory row per probe row, PlanGuard-allowlisted) — so nothing
    * beyond the stratum aggregate ever shuffles. */
  def temperatureWeights(df: DataFrame, strataCol: String, sizeCol: String,
                         alpha: Double,
                         budget: Option[Long] = None): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val agg = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_items"), sum(col(sizeCol)).as("n_tokens"))
    val tot = agg.agg(sum(pow(col("n_tokens"), alpha)).as("__z"),
        sum(col("n_tokens")).as("__tot"))
    agg.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(pow(col("n_tokens"), alpha) / col("__z"), 6))
      .withColumn("eff_epochs",
        round(budget.map(lit(_)).getOrElse(col("__tot")) *
          pow(col("n_tokens"), alpha) / col("__z") / col("n_tokens"), 6))
      .select(col(strataCol), col("n_items"), col("n_tokens"),
        col("weight"), col("eff_epochs"))
  }

  /** Greedy token-budget corpus selection: take documents in priority
    * order (highest `priorityCol` first, ties broken by ascending
    * `idCol`) until the selected documents' `sizeCol` sum would exceed
    * `budget`. This is the "keep the best N tokens" step that follows
    * quality scoring in every curation pipeline.
    *
    * Returns the SELECTED rows of `df` with their selection rank columns
    * removed — composable with any downstream op.
    *
    * Scale: a naive global running sum is a single-partition window. This
    * implements the same selection as two partitioned passes: (1) aggregate
    * `sizeCol` per distinct priority value — the priority table is bounded
    * by the priority's resolution (4-decimal quality → ≤ 10^4·|range|
    * rows), and ONLY that small table takes an unpartitioned window for
    * its prefix sum; (2) docs join the broadcast bucket prefix and need a
    * running sum only WITHIN their priority bucket (window partitioned by
    * priority value, ordered by id). Selection = bucket prefix + in-bucket
    * prefix <= budget — identical to the global order-by running sum. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, priorityCol: String,
                        sizeCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val buckets = df.groupBy(col(priorityCol).as("__p"))
      .agg(sum(col(sizeCol)).as("__btok"))
    // small-table prefix sum: tokens in all strictly-higher buckets
    val wb = Window.orderBy(col("__p").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = buckets.withColumn("__before",
      coalesce(sum(col("__btok")).over(wb), lit(0L)))
    val wd = Window.partitionBy(col(priorityCol)).orderBy(col(idCol))
    df.join(broadcast(prefix.select(col("__p"), col("__before"))),
        col(priorityCol) === col("__p"))
      .withColumn("__cum",
        col("__before") + sum(col(sizeCol)).over(wd))
      .filter(col("__cum") <= budget)
      .drop("__p", "__before", "__cum")
  }
}
