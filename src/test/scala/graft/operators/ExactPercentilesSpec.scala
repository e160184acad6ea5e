package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ExactPercentilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("matches the built-in percentile() aggregate bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000)
      .map(i => (s"g${i % 3}", rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val builtin = df.groupBy($"g")
      .agg(expr(s"percentile(v, array(${ps.mkString("D,")}D))").as("pcts"))
      .orderBy($"g").as[(String, Seq[Double])].collect()
    val sorted = ExactPercentiles.byGroup(df, "g", "v", ps)
      .orderBy($"g").as[(String, Seq[Double])].collect()
    assert(sorted.map(_._1).toSeq === builtin.map(_._1).toSeq)
    for (((_, b), (_, s)) <- builtin.zip(sorted); (bv, sv) <- b.zip(s))
      assert(bv === sv) // identical interpolation arithmetic => bit-equal
  }

  test("ignores nulls like the built-in aggregate") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(5.0))).toDF("g", "v")
    val r = ExactPercentiles.byGroup(df, "g", "v", Seq(0.5))
      .orderBy($"g").as[(String, Seq[Double])].collect()
    assert(r === Array(("a", Seq(2.0)), ("b", Seq(5.0))))
  }

  test("single-row group returns the value at every probability") {
    val df = Seq(("x", 42.0)).toDF("g", "v")
    val r = ExactPercentiles.byGroup(df, "g", "v", Seq(0.0, 0.5, 1.0))
      .as[(String, Seq[Double])].head()
    assert(r === (("x", Seq(42.0, 42.0, 42.0))))
  }
}
