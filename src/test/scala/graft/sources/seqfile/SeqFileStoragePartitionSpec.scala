package graft.sources.seqfile

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Storage-partitioned execution over hive-partitioned seqfile lakes:
  * KeyGroupedPartitioning lets Catalyst drop the exchange for grouping on
  * partition columns and run co-partitioned joins shuffle-free. */
class SeqFileStoragePartitionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    // keep the joins un-broadcast so the exchange question is real
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def mkLake(values: Map[String, Seq[(Long, String)]]): String = {
    val root = java.nio.file.Files.createTempDirectory("spj").toString
    values.foreach { case (pv, rows) =>
      rows.toDF("key", "value").coalesce(1)
        .write.format("seqfile").mode("overwrite").save(s"$root/cat=$pv")
    }
    root
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  test("groupBy on the partition column runs without an exchange") {
    val root = mkLake(Map(
      "a" -> (0L until 100L).map(i => (i, s"a$i")),
      "b" -> (0L until 50L).map(i => (i, s"b$i")),
      "c" -> (0L until 25L).map(i => (i, s"c$i"))))
    val agg = spark.read.format("seqfile").load(root)
      .groupBy(col("cat")).agg(count(lit(1)).as("n"), sum("key").as("s"))
    assert(shuffles(agg) === 0, agg.queryExecution.executedPlan.toString)
    val got = agg.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 100L), ("b", 50L), ("c", 25L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("co-partitioned seqfile lakes join storage-partitioned (no shuffle)") {
    val left = mkLake(Map(
      "x" -> (0L until 40L).map(i => (i, s"l$i")),
      "y" -> (0L until 30L).map(i => (i, s"l$i"))))
    val right = mkLake(Map(
      "x" -> (0L until 10L).map(i => (i, s"r$i")),
      "y" -> (0L until 20L).map(i => (i, s"r$i"))))
    val l = spark.read.format("seqfile").load(left)
      .groupBy("cat").agg(count(lit(1)).as("ln"))
    val r = spark.read.format("seqfile").load(right)
      .groupBy("cat").agg(count(lit(1)).as("rn"))
    val joined = l.join(r, "cat")
    assert(shuffles(joined) === 0, joined.queryExecution.executedPlan.toString)
    val got = joined.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === Set(("x", 40L, 10L), ("y", 30L, 20L)))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(left))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(right))
  }

  test("unpartitioned scans keep normal parallel behavior") {
    val dir = java.nio.file.Files.createTempDirectory("spj-flat").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("key", "value")
      .repartition(3).write.format("seqfile").mode("overwrite").save(dir)
    val agg = spark.read.format("seqfile").load(dir)
      .groupBy(col("key") % 7).agg(count(lit(1)))
    // a real shuffle is expected here — no bogus single-key grouping
    assert(shuffles(agg) > 0)
    assert(agg.collect().map(_.getLong(1)).sum === 1000L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
