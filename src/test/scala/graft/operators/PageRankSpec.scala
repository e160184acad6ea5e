package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Single-threaded reference: same recurrence, Map-based. */
  private def referencePr(edges: Seq[(Long, Long, Double)], iters: Int,
                          d: Double): Map[Long, Double] = {
    val agg = edges.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      (k._1, k._2, es.map(_._3).sum) }.toSeq
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val outW = agg.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dm = nodes.filterNot(outW.contains).map(r).sum
      val contrib = agg.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) * e._3 / outW(e._1)).sum }
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  test("matches the reference recurrence on a dangling graph; mass conserved") {
    // 1->2, 1->3, 2->3, 4->1; node 3 is DANGLING (no out-edges)
    val edges = Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 3L, 1.0), (4L, 1L, 1.0))
    val ref = referencePr(edges, iters = 12, d = 0.85)
    val got = PageRank.run(edges.toDF("s", "d", "w"), "s", "d", Some("w"),
        iters = 12, checkpointEvery = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === ref.keySet)
    for ((k, v) <- ref) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-12, "mass not conserved")
    // dangling node 3 receives the most mass in this graph
    assert(got(3L) === got.values.max)
  }

  test("unweighted default and multi-edge summing") {
    // duplicate (1,2) edges behave as weight 2
    val multi = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val viaMulti = PageRank.run(multi.toDF("s", "d"), "s", "d", None, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = referencePr(Seq((1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 1L, 1.0),
      (3L, 1L, 1.0)), iters = 8, d = 0.85)
    for ((k, v) <- ref) assert(math.abs(viaMulti(k) - v) < 1e-12, s"node $k")
  }

  test("personalized: teleport mass concentrates on and around seeds") {
    // reference with an explicit teleport vector
    def refPpr(edges: Seq[(Long, Long, Double)], seeds: Map[Long, Double],
               iters: Int, d: Double): Map[Long, Double] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      val tot = seeds.filterKeys(nodes.contains).values.sum
      val t = nodes.map(v => v -> seeds.getOrElse(v, 0.0) / tot).toMap
      var r = t
      for (_ <- 0 until iters) {
        val dm = nodes.filterNot(outW.contains).map(r).sum
        val contrib = edges.groupBy(_._2).map { case (dst, es) =>
          dst -> es.map(e => r(e._1) * e._3 / outW(e._1)).sum }
        r = nodes.map(v =>
          v -> ((1 - d) * t(v) + d * (contrib.getOrElse(v, 0.0) + dm * t(v)))).toMap
      }
      r
    }
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
      (4L, 5L, 1.0), (5L, 4L, 1.0), (3L, 4L, 1.0))
    val seeds = Seq((1L, 2.0), (2L, 1.0))
    val ref = refPpr(edges, seeds.toMap, iters = 12, d = 0.85)
    val got = PageRank.run(edges.toDF("s", "d", "w"), "s", "d", Some("w"),
        iters = 12, personalization = Some(seeds.toDF("node", "w")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((k, v) <- ref) assert(math.abs(got(k) - v) < 1e-12, s"node $k")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // the seeded cycle {1,2,3} holds most of the mass
    assert(got(1L) + got(2L) + got(3L) > got(4L) + got(5L))
    // seeds outside the graph are ignored; all-unknown seeds reject
    intercept[IllegalArgumentException] {
      PageRank.run(edges.toDF("s", "d", "w"), "s", "d", Some("w"),
        iters = 2, personalization = Some(Seq((99L, 1.0)).toDF("node", "w")))
    }
  }

  test("deterministic across runs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").as("s"), col("l_suppkey").as("d"))
    val a = PageRank.run(e, "s", "d", None, iters = 5)
      .orderBy("node").collect().toSeq
    val b = PageRank.run(e, "s", "d", None, iters = 5)
      .orderBy("node").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
