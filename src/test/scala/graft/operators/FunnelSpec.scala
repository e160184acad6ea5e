package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class FunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  test("ordering is enforced: out-of-order steps don't count") {
    val ev = Seq(
      // u1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // u2 clicks BEFORE viewing — click must not count; re-click after
      // view at 50 does
      (2L, "click", 5L), (2L, "view", 40L), (2L, "click", 50L),
      // u3 views only
      (3L, "view", 7L),
      // u4 has buy before click — stops at click
      (4L, "view", 1L), (4L, "buy", 2L), (4L, "click", 3L),
      // u5 never enters the funnel
      (5L, "buy", 9L)
    ).toDF("user_id", "et", "ts")
    val got = Funnel.userFunnel(ev, "user_id", "et", "ts", steps)
      .orderBy("user")
      .collect().map(r => (r.getLong(0), r.getInt(r.length - 1))).toSeq
    assert(got === Seq((1L, 3), (2L, 2), (3L, 1), (4L, 2)))
    // u4: buy at 2 is before click at 3 — steps_completed = 2, and a
    // LATER buy would count:
    val ev2 = ev.union(Seq((4L, "buy", 9L)).toDF("user_id", "et", "ts"))
    val u4 = Funnel.userFunnel(ev2, "user_id", "et", "ts", steps)
      .where(col("user") === 4).head()
    assert(u4.getInt(u4.length - 1) === 3)
  }

  test("equal timestamps do not chain (strictly-after)") {
    val ev = Seq((1L, "view", 10L), (1L, "click", 10L), (1L, "buy", 11L))
      .toDF("user_id", "et", "ts")
    val r = Funnel.userFunnel(ev, "user_id", "et", "ts", steps).head()
    assert(r.getInt(r.length - 1) === 1)
  }

  test("maxSpan anchors at first step-1 event") {
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 100L), (1L, "click", 150L),
      (2L, "view", 0L), (2L, "click", 50L)
    ).toDF("user_id", "et", "ts")
    val got = Funnel.userFunnel(ev, "user_id", "et", "ts",
        Seq("view", "click"), maxSpan = Some(lit(100L)))
      .orderBy("user")
      .collect().map(r => (r.getLong(0), r.getInt(r.length - 1))).toSeq
    // u1's anchor is ts=0; click at 150 > 0+100 — not converted
    assert(got === Seq((1L, 1), (2L, 2)))
  }

  test("conversion table: monotone non-increasing, base = step-1 users") {
    // ts stays a timestamp — the funnel only needs ordering and min
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val conv = Funnel.conversion(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect()
    assert(conv.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    val users = conv.map(_.getLong(2))
    assert(users.sliding(2).forall(p => p(0) >= p(1)))
    assert(conv(0).getDouble(3) === 1.0 && users(0) > 0)
  }
}
