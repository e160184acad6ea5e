package graft.sources.seqfile

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SeqFileConnectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("seqfile-connector-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  val textInt = "/root/reference/tests/text-int.seq"
  val longDouble = "/root/reference/tests/long-double.seq"

  test("schema inference from header: text-int → (key string, value int)") {
    val df = spark.read.format("seqfile").load(textInt)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("key", "string"), ("value", "int")))
  }

  test("count() on golden fixture — the reference's recordCount as DataFrame op") {
    val df = spark.read.format("seqfile").load(textInt)
    assert(df.count() === 100000L)
  }

  test("aggregates over the golden fixture: key range and value stats") {
    val df = spark.read.format("seqfile").load(textInt)
    val r = df.agg(min("key"), max("key"), min("value"), max("value"),
      avg("value")).head()
    assert(r.getString(0) === "F0000000")
    assert(r.getString(1) === "F0099999")
    assert(r.getInt(2) >= 0 && r.getInt(3) <= 100)
    assert(math.abs(r.getDouble(4) - 50.0) < 2.0) // uniform-ish 0..100
  }

  test("long-double fixture reads as (long, double)") {
    val df = spark.read.format("seqfile").load(longDouble)
    assert(df.schema.map(_.dataType.simpleString) === Seq("bigint", "double"))
    assert(df.count() > 0)
    assert(df.agg(count(when(isnan(col("value")), 1))).head().getLong(0) === 0L)
  }

  test("column pruning reaches the scan (keys-only plan mentions only key)") {
    val df = spark.read.format("seqfile").load(textInt).select("key")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=key"), s"scan description missing pruning:\n$plan")
    assert(df.limit(10).collect().length === 10)
  }

  test("small maxSplitBytes yields multiple partitions that agree with single-partition read") {
    val whole = spark.read.format("seqfile").load(textInt)
      .agg(sum("value")).head().getLong(0)
    val split = spark.read.format("seqfile")
      .option("maxSplitBytes", (64 * 1024).toString).load(textInt)
    assert(split.rdd.getNumPartitions > 2)
    assert(split.agg(sum("value")).head().getLong(0) === whole)
    assert(split.count() === 100000L)
  }

  test("round-trip: DataFrame → seqfile → DataFrame, overwrite mode") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seqwrite").toString
    val src = (0 until 10000).map(i => (i.toLong, s"payload-$i")).toDF("key", "value")
    src.write.format("seqfile").mode("overwrite").save(dir)
    // overwrite again to exercise truncate
    src.write.format("seqfile").mode("overwrite").save(dir)
    val back = spark.read.format("seqfile").load(dir)
    assert(back.schema.map(_.dataType.simpleString) === Seq("bigint", "string"))
    assert(back.count() === 10000L)
    assert(back.orderBy("key").collect().toSeq ===
      src.orderBy("key").collect().toSeq)
    // files on disk are readable by real Hadoop too
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".seq")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val rd = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(new org.apache.hadoop.fs.Path(part.toString)))
    assert(rd.getKeyClassName === "org.apache.hadoop.io.LongWritable")
    assert(rd.getValueClassName === "org.apache.hadoop.io.Text")
    rd.close()
  }

  test("reading multiple files in a directory unions them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sequnion").toString
    // note: v2 TableProvider sources accept only append/overwrite modes
    (0 until 100).map(i => (i, s"a$i")).toDF("key", "value")
      .repartition(3).write.format("seqfile").mode("append").save(dir)
    val back = spark.read.format("seqfile").load(dir)
    assert(back.count() === 100L)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".seq")) === 3)
  }

  test("schema mismatch fails fast like the reference's type check") {
    val ex = intercept[Exception] {
      spark.read.format("seqfile")
        .schema("key STRING, value BIGINT") // file has int values
        .load(textInt).collect()
    }
    def allMessages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + allMessages(t.getCause)
    assert(allMessages(ex).contains("schema mismatch"))
  }

  test("null key/value rejected on write (format has no null representation)") {
    import spark.implicits._
    val df = Seq((Some(1L), Some("a")), (None, Some("b")))
      .toDF("key", "value")
    val dir = java.nio.file.Files.createTempDirectory("seqnull").toString
    val ex = intercept[Exception] {
      df.write.format("seqfile").mode("overwrite").save(dir)
    }
    def allMessages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + allMessages(t.getCause)
    assert(allMessages(ex).contains("NULL"))
  }
}
