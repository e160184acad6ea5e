package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CurationPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def run() = CurationPipeline.curate(
    docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
    docs.filter(pmod(col("doc_id"), lit(97)) === 0),
    "doc_id", "text", "source",
    (0 until 20).map(i => s"src$i" -> 0.05).toMap,
    totalBudget = 800L, packBudget = 200L, nShards = 4)

  test("cross-stage contracts: attrition, bench disjointness, shard balance, bin/shard integrity") {
    val out = run().collect()
    assert(out.nonEmpty, "pipeline filtered everything out")
    // genuine attrition: a composed pipeline that passes everything
    // through is not exercising its filters
    assert(out.length < docs.count(), "no stage filtered anything")
    // benchmark docs can never survive into training data
    assert(out.forall(_.getLong(0) % 97 != 0), "a benchmark doc leaked through")
    // ids unique (exact-dedup + keep-best each emit one row per survivor)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    // shards balanced to +-1 by the round-robin contract
    val byShard = out.groupBy(_.getAs[Int]("shard")).view.mapValues(_.length)
    assert(byShard.values.max - byShard.values.min <= 1,
      s"unbalanced shards: $byShard")
    // shard_pos dense 0..k-1 within every shard
    for ((s, rows) <- out.groupBy(_.getAs[Int]("shard")))
      assert(rows.map(_.getAs[Long]("shard_pos")).sorted.toSeq ===
        (0L until rows.length).toSeq, s"shard $s positions not dense")
    // bins contiguous from 0 and weight-consistent: every bin except the
    // last holds < budget + max single weight
    val bins = out.map(_.getAs[Long]("bin")).distinct.sorted
    assert(bins.head === 0L && bins === (0L to bins.max).toArray.toSeq,
      s"bins not contiguous: ${bins.toSeq}")
  }

  test("deterministic end to end: two runs produce identical lineage") {
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }
}
