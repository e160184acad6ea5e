package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals plain join on heavily skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (0 until 20000).map(i =>
      (if (i % 10 == 0) i % 100 else 7, s"l$i")).toDF("k", "lv")
    val right = (0 until 100).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(plain.count(_._1 == 7) === 18000)
  }

  test("hot key spreads across salt buckets") {
    import spark.implicits._
    val left = (0 until 8000).map(i => (7, s"l$i")).toDF("k", "lv")
    val salts = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(salts.length === 8, "all 8 salt buckets used")
    assert(salts.max < 8000 / 2, "no bucket holds the majority")
  }
}
