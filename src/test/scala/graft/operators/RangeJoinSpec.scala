package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("overlap join equals the theta join, across bin widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map { i =>
      val s = rnd.nextInt(100000).toLong; (i.toLong, s, s + rnd.nextInt(5000))
    }.toDF("id", "s", "e")
    val right = (0 until 300).map { i =>
      val s = rnd.nextInt(100000).toLong; (i.toLong, s, s + rnd.nextInt(500))
    }.toDF("id", "s", "e")
    val expected = left.as("l").join(right.as("r"),
        col("l.s") <= col("r.e") && col("r.s") <= col("l.e"))
      .select(col("l.id"), col("r.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(100L, 1000L, 7777L, 100000L)) {
      val got = RangeJoin.overlapJoin(left, right, "id", "s", "e", "id", "s", "e", w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet === expected, s"mismatch at width $w")
    }
    assert(expected.nonEmpty)
  }

  test("zero-length (point) intervals work: point-in-interval membership") {
    import spark.implicits._
    val intervals = Seq((1L, 100L, 200L), (2L, 150L, 300L)).toDF("id", "s", "e")
    val points = Seq((10L, 99L), (11L, 100L), (12L, 175L), (13L, 301L))
      .toDF("id", "t").withColumn("e", col("t"))
    val got = RangeJoin.overlapJoin(intervals, points, "id", "s", "e", "id", "t", "e", 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 11L), (1L, 12L), (2L, 12L)))
  }
}
