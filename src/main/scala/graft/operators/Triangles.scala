package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected edge list — the graph-shape
  * metric curation pipelines use for link-farm/spam detection (spam
  * neighborhoods are triangle-dense) and analysts use for clustering
  * coefficients.
  *
  * Algorithm: DEGREE-ORDERED orientation (Suri & Vassilvitskii, WWW'11
  * "Counting triangles and the curse of the last reducer"). Each
  * undirected edge is oriented from the endpoint of lower (degree, id)
  * rank to the higher; every triangle then has exactly ONE wedge
  * (u→v, u→w) whose closing edge (v→w) is also oriented — so
  * triangles = wedges ⋈ oriented-edges, each counted once.
  *
  * Why this shape at 100 TB: the naive wedge join explodes on hubs — a
  * node of degree d contributes d² wedges (the "last reducer" holds the
  * celebrity). Orientation caps effective out-degree at O(√m) (a node
  * cannot out-rank more than √m neighbors of higher degree), so the wedge
  * count is Σ outdeg² ≤ O(m^1.5) worst case and near-linear on real
  * skewed graphs — the standard distributed bound. All steps are
  * declarative joins/aggregations (shuffle on node ids only); nothing
  * collects to the driver.
  */
object Triangles {

  /** Distinct undirected edges as (lo, hi), self-loops dropped. */
  private def undirected(edges: DataFrame, aCol: String,
                         bCol: String): DataFrame = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    edges.select(least(a, b).as("lo"), greatest(a, b).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
  }

  /** Per-node triangle participation counts: (node, triangles). Nodes in
    * no triangle are omitted (left-join against `degrees` to densify). */
  def perNode(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val tri = triangleList(edges, aCol, bCol)
    tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** Global triangle count (one row). */
  def totalCount(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    triangleList(edges, aCol, bCol).agg(count(lit(1)).as("triangles"))

  /** The triangle list itself: one row (a, b, c) per triangle with
    * a < b < c — the auditable form both count views derive from. */
  def triangleList(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = undirected(edges, aCol, bCol)
    // total degree per node (undirected), the orientation rank
    val deg = e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src = lower rank endpoint
    val withDeg = e
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), "hi")
    val oriented = withDeg.select(
      when(col("dlo") < col("dhi") ||
          (col("dlo") === col("dhi") && col("lo") < col("hi")),
        struct(col("lo").as("src"), col("hi").as("dst")))
        .otherwise(struct(col("hi").as("src"), col("lo").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // wedges (u→v, u→w) with v < w (dedup the unordered wedge pair), then
    // close against the oriented edge (v→w) OR (w→v) — the closing edge's
    // orientation depends on v and w's ranks, so check the undirected pair
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
    val closing = e.select(col("lo").as("v"), col("hi").as("w"))
    wedges.join(closing, Seq("v", "w"))
      .select(least(col("u"), col("v"), col("w")).as("a"),
        (col("u") + col("v") + col("w") -
          least(col("u"), col("v"), col("w")) -
          greatest(col("u"), col("v"), col("w"))).as("b"),
        greatest(col("u"), col("v"), col("w")).as("c"))
  }
}
