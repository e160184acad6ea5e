package graft.sources.seqfile

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** df.write.partitionBy(...) on the seqfile DSv2: rows route to hive-style
  * `k=v` subdirectories (Hive-style percent-escaped, matching read-side
  * discovery AND external Hive/Spark readers), the remaining two columns
  * form the record, and the read side recovers the partition column. */
class SeqFilePartitionedWriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def df = (1L to 300L)
    .map(i => (i, s"v$i", s"src${i % 3}")).toDF("key", "value", "source")

  test("partitionBy write round-trips with partition column recovered") {
    val out = Files.createTempDirectory("seqpartw").toString
    df.write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    // hive-style dirs on disk
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("source=src0", "source=src1", "source=src2"))
    val back = spark.read.format("seqfile").load(out)
    assert(back.columns.sorted.toSeq === Seq("key", "source", "value"))
    assert(back.count() === 300)
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === (1L to 300L).map(i => (i, s"v$i", s"src${i % 3}")).toSet)
  }

  test("partition pruning: filter on the partition column lists one directory") {
    val out = Files.createTempDirectory("seqpartw2").toString
    df.write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    val one = spark.read.format("seqfile").load(out)
      .filter(col("source") === "src1")
    assert(one.count() === 100)
    assert(one.select("key").as[Long].collect().forall(_ % 3 == 1))
  }

  test("multi-level partitionBy and special characters escape Hive-style") {
    val out = Files.createTempDirectory("seqpartw3").toString
    Seq((1L, "a", "x y", 7), (2L, "b", "x y", 8), (3L, "c", "p/q", 7))
      .toDF("key", "value", "grp", "n")
      .write.format("seqfile").mode("overwrite").partitionBy("grp", "n").save(out)
    // On-disk layout matches what Hive/Spark file sources produce: space
    // stays LITERAL (not '+'), '/' percent-escapes — external readers
    // decode these directories identically.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq("grp=p%2Fq", "grp=x y"))
    val back = spark.read.format("seqfile").load(out)
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    // partition values come back as strings (hive-style read), decoded
    assert(got === Set((1L, "a", "x y", "7"), (2L, "b", "x y", "8"), (3L, "c", "p/q", "7")))
  }

  test("PartitionPaths: Hive escape semantics round-trip; '+' stays literal") {
    assert(PartitionPaths.escape("x y") === "x y")
    assert(PartitionPaths.escape("p/q") === "p%2Fq")
    assert(PartitionPaths.escape("100%") === "100%25")
    // form-encoding divergence the old URLEncoder scheme had: '+' is a
    // literal character, never a space, in either direction
    assert(PartitionPaths.escape("a+b") === "a+b")
    assert(PartitionPaths.unescape("a+b") === "a+b")
    val nasty = "a=b/c:d%e\\f\"g'h#i*j?k[l]m^n{o\tp"
    assert(PartitionPaths.unescape(PartitionPaths.escape(nasty)) === nasty)
    // malformed escapes from external writers stay literal, never throw
    assert(PartitionPaths.unescape("%") === "%")
    assert(PartitionPaths.unescape("%2") === "%2")
    assert(PartitionPaths.unescape("%G1") === "%G1")
  }

  test("overwrite truncates previous partitioned contents") {
    val out = Files.createTempDirectory("seqpartw4").toString
    df.write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    df.filter(col("source") === "src0")
      .write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    assert(spark.read.format("seqfile").load(out).count() === 100)
  }

  test("null partition value fails with a clear error") {
    val out = Files.createTempDirectory("seqpartw5").toString
    val bad = Seq((1L, "a", null.asInstanceOf[String])).toDF("key", "value", "source")
    val e = intercept[Exception] {
      bad.write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    }
    assert(e.getMessage.contains("null partition value") ||
      Option(e.getCause).exists(_.getMessage.contains("null partition value")))
  }

  test("compactAll compacts every partition leaf; contents survive exactly") {
    val out = Files.createTempDirectory("seqpartw7").toString
    // many small files per partition: repartition(12) before the write
    df.repartition(12)
      .write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    val before = spark.read.format("seqfile").load(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val counts = graft.api.SequenceFiles.compactAll(spark, out,
      targetFileBytes = 64L * 1024 * 1024)
    assert(counts.keySet === Set("source=src0", "source=src1", "source=src2"))
    assert(counts.values.forall(_ === 1), s"expected 1 file per leaf: $counts")
    val after = spark.read.format("seqfile").load(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after === before)
  }

  test("zone maps still work under partitionBy (sorted within partitions)") {
    val out = Files.createTempDirectory("seqpartw6").toString
    df.repartition(col("source")).sortWithinPartitions(col("key"))
      .write.format("seqfile").mode("overwrite").partitionBy("source").save(out)
    val hit = spark.read.format("seqfile").load(out)
      .filter(col("key") === 42L)
    assert(hit.count() === 1)
    assert(hit.head().getString(2) === "src0") // 42 % 3 = 0
  }
}
