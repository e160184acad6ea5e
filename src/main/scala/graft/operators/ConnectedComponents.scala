package graft.operators

import org.apache.spark.sql.DataFrame
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
  * lineage is truncated with localCheckpoint so the plan stays constant-size
  * across iterations (no exponential Catalyst blowup).
  *
  * Scale (100 TB / 1000 executors): labels shuffle as 16-byte (id, comp)
  * rows — independent of document size; the edge list is checkpointed once
  * and re-joined per round. Dedup graphs are near-cliques (diameter <= ~3),
  * so 2-3 rounds in practice; a pathological path graph of length 2^k
  * converges in ~k rounds (asserted in ConnectedComponentsSpec).
  */
object ConnectedComponents {

  /** Returns one row per distinct node in `edges`: (id, comp) where comp is
    * the minimum node id reachable from `id`. Node columns must be integral
    * (cast to long). */
  def components(edges: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 30): DataFrame = {
    val sym0 = edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // Symmetric closure PLUS a self-loop per node: the neighbor step below
    // is then a single join + min-aggregate over the CLOSED neighborhood —
    // no union of a plan with its own derivative (which trips Catalyst's
    // Union constraint rewrite when the shared subtree is a checkpoint).
    val e = sym0
      .union(sym0.select(col("dst").as("src"), col("src").as("dst")))
      .union(sym0.select(col("src"), col("src").as("dst")))
      .union(sym0.select(col("dst").as("src"), col("dst")))
      .distinct().localCheckpoint()

    var labels = e.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()

    var done = labels.isEmpty
    var i = 0
    while (!done && i < maxIter) {
      // (1) min over closed neighborhood (self-loops carry the own label)
      val stepped = e.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("comp").as("comp"))
      // (2) pointer jump: follow comp -> comp(comp). comp is always a node
      // id present in `stepped`, so the join hits unless comp == id (root).
      val jumped = stepped.as("x")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")).as("y"),
          col("x.comp") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("y.ccomp"), col("x.comp")).as("comp"))
        .localCheckpoint()
      val changed = jumped.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") =!= col("o.comp")).limit(1).count() > 0
      labels = jumped
      done = !changed
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
        "(graph diameter > 2^maxIter is not plausible — check for label churn)")
    labels
  }
}
