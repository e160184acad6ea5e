package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import EventStreams.Event

/** Stream == batch: the same transforms run incrementally through
  * MemoryStream must produce what the one-shot batch run produces. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000)

  private def mkEvents: Seq[Event] = {
    // two users, sessions separated by > 30min gaps, plus interleaving
    val u1 = Seq(0L, 5L, 10L, 70L, 75L, 200L).zipWithIndex.map { case (m, i) =>
      Event(i, ts(m), 1L, "click", 1.0 + i) }
    val u2 = Seq(2L, 3L, 120L).zipWithIndex.map { case (m, i) =>
      Event(100 + i, ts(m), 2L, "view", 2.0) }
    u1 ++ u2
  }

  test("windowedAgg: incremental micro-batches equal one-shot batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedAgg(stream.toDF(), "1 hour", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("winagg").outputMode("complete").start()
    // feed in three micro-batches
    events.grouped(3).foreach { g => stream.addData(g); q.processAllAvailable() }
    val streamed = spark.table("winagg")
      .select("ws", "event_type", "n", "sum_value").collect().toSet
    q.stop()
    val batch = EventStreams.windowedAgg(events.toDF(), "1 hour", "1 hour", "10 minutes")
      .select("ws", "event_type", "n", "sum_value").collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("windowedAgg append mode drops late data beyond the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreams.windowedAgg(stream.toDF(), "1 hour", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()
    stream.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(65), 1, "click", 1.0))
    q.processAllAvailable()
    // watermark now 65-10=55min → hour-0 window [0,60) is closed and emitted
    stream.addData(Event(3, ts(200), 1, "click", 1.0))
    q.processAllAvailable()
    // this event is 3+ hours late; watermark has passed its window end
    stream.addData(Event(4, ts(5), 1, "click", 99.0))
    q.processAllAvailable()
    stream.addData(Event(5, ts(400), 1, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("late").collect()
    q.stop()
    // windows align to epoch hours; find the one containing ts(0)
    val hour0Start = new Timestamp(ts(0).getTime / 3600000L * 3600000L)
    val hour0 = rows.filter(_.getAs[Timestamp]("ws") == hour0Start)
    assert(hour0.length === 1)
    assert(hour0.head.getAs[Long]("n") === 1L, "late event must not be counted")
  }

  test("sessionWindows (built-in) matches the batch window-function sessionization") {
    import spark.implicits._
    val events = mkEvents
    val got = EventStreams.sessionWindows(events.toDF(), "30 minutes", "10 minutes")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected sessions: u1 [0,5,10], [70,75], [200]; u2 [2,3], [120]
    assert(got === Set((1L, 3L), (1L, 2L), (1L, 1L), (2L, 2L), (2L, 1L)))
  }

  test("sessionizeStateful: streaming sessions equal batch sessions after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = mkEvents
    val stream = MemoryStream[Event]
    val q = EventStreams.sessionizeStateful(stream.toDS(), 30 * 60000L, "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    events.sortBy(_.ts.getTime).grouped(4).foreach { g =>
      stream.addData(g); q.processAllAvailable()
    }
    // advance the watermark far past everything to flush open sessions
    stream.addData(Event(999, ts(10000), 99L, "flush", 0.0))
    q.processAllAvailable()
    stream.addData(Event(1000, ts(20000), 99L, "flush", 0.0))
    q.processAllAvailable()
    val got = spark.table("sess")
      .filter(col("user_id") =!= 99)
      .select("user_id", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    q.stop()
    val expected = Set(
      (1L, ts(0), ts(10), 3L), (1L, ts(70), ts(75), 2L), (1L, ts(200), ts(200), 1L),
      (2L, ts(2), ts(3), 2L), (2L, ts(120), ts(120), 1L))
    assert(got === expected)
  }

  test("streamingDedup drops repeated content across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("id", "ts", "text")
    val q = EventStreams.streamingDedup(df, "text", "1 hour")
      .writeStream.format("memory").queryName("streamdedup").outputMode("append").start()
    try {
      stream.addData((1L, ts(0), "alpha doc"), (2L, ts(1), "beta doc"))
      q.processAllAvailable()
      // same normalized content ("ALPHA   DOC") in a later batch → dropped
      stream.addData((3L, ts(2), "ALPHA   DOC"), (4L, ts(3), "gamma doc"))
      q.processAllAvailable()
      val ids = spark.table("streamdedup").select("id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streamingDedupIncremental drops corpus-known AND within-stream repeats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // standing index: fingerprints of two known documents
    val corpus = Seq("alpha doc", "known doc").toDF("text")
      .select(graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("id", "ts", "text")
    val q = EventStreams.streamingDedupIncremental(df, "text", corpus, "fp", "1 hour")
      .writeStream.format("memory").queryName("streamdedupinc").outputMode("append").start()
    try {
      // 1 collides with the corpus (normalized), 2 is new
      stream.addData((1L, ts(0), "ALPHA   DOC"), (2L, ts(1), "beta doc"))
      q.processAllAvailable()
      // 3 repeats an in-stream doc from the previous batch, 4 hits the
      // corpus, 5 is new
      stream.addData((3L, ts(2), "beta doc"), (4L, ts(3), "known doc"),
        (5L, ts(4), "gamma doc"))
      q.processAllAvailable()
      val ids = spark.table("streamdedupinc").select("id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(2L, 5L))
    } finally q.stop()
  }

  test("stream-stream interval join: purchase attribution equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clickStream = MemoryStream[Event]
    val purchaseStream = MemoryStream[Event]
    def tss(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)
    def ev(id: Long, sec: Int, user: Long, typ: String, v: Double) =
      Event(id, tss(sec), user, typ, v)
    val clicks = Seq(
      ev(1, 0, 1, "click", 0), ev(2, 30, 1, "click", 0),
      ev(3, 10, 2, "click", 0), ev(4, 500, 2, "click", 0))
    val purchases = Seq(
      ev(10, 60, 1, "purchase", 9.5),   // joins clicks 1 (60s gap) and 2 (30s)
      ev(11, 520, 2, "purchase", 3.0),  // joins click 4 only (3 is 510s stale)
      ev(12, 40, 3, "purchase", 1.0))   // no clicks → inner join drops it
    val joined = EventStreams.purchaseAttribution(
      clickStream.toDF(), purchaseStream.toDF(), "10 minutes", "60 seconds")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clickStream.addData(clicks: _*)
      purchaseStream.addData(purchases: _*)
      q.processAllAvailable()
      val got = spark.table("attrib").select("purchase_id", "click_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      val batch = EventStreams.purchaseAttribution(
          clicks.toDF(), purchases.toDF(), "10 minutes", "60 seconds")
        .select("purchase_id", "click_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(got === batch)
      assert(got === Set((10L, tss(0)), (10L, tss(30)), (11L, tss(500))))
    } finally q.stop()
  }

  test("file-based streaming over events parquet: stream count == batch count") {
    // copy a slice of the real events table into a dir and stream it
    import spark.implicits._
    val src = graft.SparkEntry.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    src.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val agg = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("filestream").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    val batch = src.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed === batch)
  }
}
