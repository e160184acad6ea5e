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
}
