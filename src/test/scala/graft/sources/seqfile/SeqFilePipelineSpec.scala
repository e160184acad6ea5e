package graft.sources.seqfile

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The q_seqfile_pipeline contract: an LLM-pipeline operator composed
  * over the seqfile connector keeps BOTH scan optimizations — partition
  * dirs prune at planning time under the dedup query, and projection
  * plans that never touch `key` prune it out of the block decode. */
class SeqFilePipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("seq-pipe").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("key"), col("text").as("value"), col("source"))
      .write.format("seqfile").mode("overwrite").partitionBy("source")
      .save(dir)
    dir
  }

  /** Sum of seqfile-scan input splits across the whole plan — descending
    * through the AQE wrapper the dedup's joins put on top (a plain
    * collectFirst on executedPlan stops at AdaptiveSparkPlanExec). */
  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => p +: p.children.flatMap(walk)
    }
    val scans = walk(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.inputRDD.getNumPartitions }
    assert(scans.nonEmpty, "no BatchScanExec found in plan")
    scans.sum
  }

  test("dedup over the lake equals dedup over the parquet original (write->scan->operator value parity)") {
    val parquet = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("key"), col("text").as("value"), col("source"))
    val lake = spark.read.format("seqfile").load(root)
    def stats(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.exactDedup(df, "key", "value")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), countDistinct(col("fp")).as("u"),
          sum(col("rep_id")).as("rs"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(stats(lake) === stats(parquet))
  }

  test("partition filter under the dedup query prunes source dirs at planning time") {
    val lake = spark.read.format("seqfile").load(root)
    val all = graft.operators.Dedup.exactDedup(lake, "key", "value")
    val some = graft.operators.Dedup.exactDedup(
      lake.filter(col("source").isin("src1", "src7", "src13")),
      "key", "value")
    assert(scanPartitions(some) < scanPartitions(all),
      "partition filter did not prune input splits under the operator")
    assert(some.select(col("source")).distinct().count() === 3)
  }

  test("projection that never touches key prunes it from the block decode") {
    val lake = spark.read.format("seqfile").load(root)
    val proj = lake.groupBy(col("source"))
      .agg(sum(length(col("value"))).as("chars"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("columns=value"),
      s"scan description must show key pruned out:\n$plan")
    assert(!plan.contains("columns=key,value"),
      s"key survived a value-only projection:\n$plan")
    assert(proj.collect().length === 20)
  }
}
