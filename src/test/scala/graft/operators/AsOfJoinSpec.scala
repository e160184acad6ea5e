package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: Long): Timestamp = new Timestamp(1700000000000L + s * 1000)

  test("backward as-of join: latest right row at or before each left row, per key") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "p1"), (1L, ts(20), "p2"), (2L, ts(5), "p3"),
      (3L, ts(10), "p4"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(8), "v1"), (1L, ts(15), "v2"), (1L, ts(25), "v3"),
      (2L, ts(5), "v4"))
      .toDF("k", "t", "vname")
    val out = AsOfJoin.asofBackward(left, right, "k", "t", "t")
      .select("name", "r_vname").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull)).toMap
    assert(out === Map(
      "p1" -> "v1",   // 8 <= 10, 15 is later
      "p2" -> "v2",   // 15 <= 20 < 25
      "p3" -> "v4",   // tie: v.t == l.t is inclusive
      "p4" -> null))  // key 3 has no right rows
  }

  test("sub-second ordering: a right row later in the same second is not matched") {
    import spark.implicits._
    def micro(us: Long): Timestamp = {
      val t = new Timestamp(1700000000000L)
      t.setNanos((us * 1000).toInt)
      t
    }
    val left = Seq((1L, micro(100000), "p")).toDF("k", "t", "name")   // .1s
    val right = Seq((1L, micro(900000), "late"), (1L, micro(50000), "early"))
      .toDF("k", "t", "vname")                                        // .9s / .05s
    val out = AsOfJoin.asofBackward(left, right, "k", "t", "t")
      .select("r_vname").head().getString(0)
    assert(out === "early")
  }

  test("forward as-of join: earliest right row at or after each left row") {
    import spark.implicits._
    val left = Seq((1L, ts(10), "p1"), (1L, ts(30), "p2")).toDF("k", "t", "name")
    val right = Seq((1L, ts(10), "v-eq"), (1L, ts(20), "v-mid")).toDF("k", "t", "vname")
    val out = AsOfJoin.asofForward(left, right, "k", "t", "t")
      .select("name", "r_vname").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull)).toMap
    assert(out === Map(
      "p1" -> "v-eq",  // inclusive tie at t=10
      "p2" -> null))   // nothing at/after 30
  }

  test("tolerance bounds the match window") {
    import spark.implicits._
    val left = Seq((1L, ts(100), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts(10), "old")).toDF("k", "t", "vname")
    val within = AsOfJoin.asofBackward(left, right, "k", "t", "t",
      toleranceMicros = 100L * 1000000).select("r_vname").head().getString(0)
    assert(within === "old") // 90s gap <= 100s tolerance
    val beyond = AsOfJoin.asofBackward(left, right, "k", "t", "t",
      toleranceMicros = 60L * 1000000).select("r_vname").head()
    assert(beyond.isNullAt(0)) // 90s gap > 60s tolerance
  }

  test("null keys and null times: left preserved with null right, no NPE, no sentinel collisions") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(ts(10)), "normal"),
      (None: Option[Long], Option(ts(10)), "nullkey"),
      (Option(1L), None: Option[Timestamp], "nulltime"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Option(1L), Option(ts(5)), "v1"),
      (None: Option[Long], Option(ts(5)), "nullkey-right"),
      (Option(1L), None: Option[Timestamp], "nulltime-right"))
      .toDF("k", "t", "vname")
    val out = AsOfJoin.asofBackward(left, right, "k", "t", "t")
      .select("name", "r_vname").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull)).toMap
    assert(out === Map(
      "normal" -> "v1",      // matches only the valid right row
      "nullkey" -> null,     // null key joins nothing (not even null-key right)
      "nulltime" -> null))   // null time can't satisfy the as-of predicate
  }

  test("matches a window-function reference implementation on real events") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    val ev = graft.SparkEntry.events(spark2, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"))
    val views = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("ts"), col("user_id"))
    val got = AsOfJoin.asofBackward(purchases, views, "user_id", "ts", "ts", "v_")
      .select(col("event_id"), col("v_event_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // reference: theta join + row_number (correct but O(pairs))
    val joined = purchases.as("p").join(views.as("v"),
        col("p.user_id") === col("v.user_id") && col("v.ts") <= col("p.ts"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p.event_id")).orderBy(col("v.ts").desc)
    val expected = joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("p.event_id"), col("v.event_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("binary keys: equal byte-array keys group together (value, not identity)") {
    import spark.implicits._
    // Two distinct Array[Byte] instances with equal content must match;
    // toString on arrays is identity-based, so this guards the canonical
    // hex encoding of the group key.
    val left = Seq((Array[Byte](1, 2, 3), ts(10), "p1"),
      (Array[Byte](9, 9), ts(10), "p2")).toDF("k", "t", "name")
    val right = Seq((Array[Byte](1, 2, 3), ts(8), "v1"),
      (Array[Byte](7, 7), ts(8), "v2")).toDF("k", "t", "vname")
    val out = AsOfJoin.asofBackward(left, right, "k", "t", "t")
      .select("name", "r_vname").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).orNull)).toMap
    assert(out === Map("p1" -> "v1", "p2" -> null))
  }
}
