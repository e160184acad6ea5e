package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class RetentionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("hand-computed cohort table") {
    // periods encoded directly: u1 cohort 0 active 0,1,3; u2 cohort 0
    // active 0; u3 cohort 1 active 1,2; duplicate events collapse
    val ev = Seq((1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 0L), (3L, 1L), (3L, 2L), (3L, 2L))
      .toDF("user_id", "p")
    val got = Retention.cohortRetention(ev, "user_id", col("p"), 3)
      .orderBy("cohort", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 2L, 1.0), // u1,u2
      (0L, 1L, 1L, 2L, 0.5), // u1
      (0L, 3L, 1L, 2L, 0.5), // u1
      (1L, 0L, 1L, 1L, 1.0), // u3
      (1L, 1L, 1L, 1L, 1.0)  // u3
    ))
  }

  test("offset 0 retention is always 1.0; offsets beyond maxOffset dropped") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("p", floor(unix_micros(col("ts").cast("timestamp")) /
        lit(86400000000L)))
    val r = Retention.cohortRetention(ev, "user_id", col("p"), 7)
    val off0 = r.where(col("offset") === 0)
      .where(col("retention") =!= 1.0).count()
    assert(off0 === 0)
    assert(r.agg(max("offset")).head().getLong(0) <= 7)
    assert(r.count() > 0)
  }
}
