package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def comps(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles and an isolated edge") {
    val got = comps((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (20L, 21L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("bridge node merges two cliques into one component") {
    val got = comps((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (3L, 5L))
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("path graph of length 64 converges (pointer jumping, not O(diameter))") {
    // plain min-propagation needs 64 rounds here; pointer jumping needs
    // O(log 64) — maxIter=12 only passes with the shortcut step working
    val edges = (0L until 64L).map(i => (i, i + 1))
    val got = ConnectedComponents.components(
      edges.toDF("a", "b"), "a", "b", maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 65)
    assert(got.values.forall(_ == 0L))
  }

  test("empty edge list yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.components(empty, "a", "b").isEmpty)
  }

  test("self-loops and duplicate edges are harmless") {
    val got = comps((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L))
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("representatives: quality policy picks best member per cluster, singletons self-rep") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "short"),            // cluster {1,2,3}: doc 2 is longest
      (2L, "the longest text"),
      (3L, "mid text"),
      (4L, "also long text x"), // cluster {4,5}: tie on length -> min id 4
      (5L, "also long text y"),
      (9L, "a singleton")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = ConnectedComponents.representatives(
        docs, pairs, "doc_id", "id_a", "id_b", length(col("text")))
      .select("doc_id", "component", "cluster_size", "rep_id", "is_rep")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((1L, 3L, 2L, false)))
    assert(out(2L) === ((1L, 3L, 2L, true)))
    assert(out(3L) === ((1L, 3L, 2L, false)))
    assert(out(4L) === ((4L, 2L, 4L, true)))
    assert(out(5L) === ((4L, 2L, 4L, false)))
    assert(out(9L) === ((9L, 1L, 9L, true)))
    // exactly one representative per component
    assert(out.values.groupBy(_._1).forall(_._2.count(_._4) == 1))
  }
}
