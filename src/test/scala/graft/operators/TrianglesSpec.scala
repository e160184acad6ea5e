package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TrianglesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("hand graphs: K4, path, star, self-loops/dups/direction ignored") {
    // K4 = 4 triangles; duplicate + reversed + self-loop edges must not
    // change the count
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (2, 1), (3, 3), (1, 2))
    val t = Triangles.triangleList(k4.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(t === Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))

    val path = Seq((1, 2), (2, 3), (3, 4))
    assert(Triangles.totalCount(path.toDF("a", "b"), "a", "b")
      .head().getLong(0) === 0L)
    val star = Seq((0, 1), (0, 2), (0, 3), (0, 4))
    assert(Triangles.totalCount(star.toDF("a", "b"), "a", "b")
      .head().getLong(0) === 0L)
  }

  test("per-node counts sum to 3x total; matches naive triple join") {
    val ps = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
    val e = ps.as("a").join(ps.as("b"),
        col("a.pk") === col("b.pk") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("lo"), col("b.sk").as("hi"))
      .agg(count(lit(1)).as("c")).where(col("c") >= 15)
      .select(col("lo"), col("hi"))
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.lo") === col("e1.hi"))
      .join(e.as("e3"),
        col("e3.lo") === col("e1.lo") && col("e3.hi") === col("e2.hi"))
      .count()
    val total = Triangles.totalCount(e, "lo", "hi").head().getLong(0)
    assert(total === naive && total > 0)
    val perNodeSum = Triangles.perNode(e, "lo", "hi")
      .agg(sum("triangles")).head().getLong(0)
    assert(perNodeSum === 3 * total)
  }

  test("no triangle is double-counted on a rank-tie-heavy graph") {
    // cycle C5 plus chords — all degrees equal on the cycle (tie-break by
    // id must still orient acyclically)
    val g = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 3), (3, 5))
    val t = Triangles.triangleList(g.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(t === Seq((1L, 2L, 3L), (1L, 3L, 5L), (3L, 4L, 5L)))
  }
}
