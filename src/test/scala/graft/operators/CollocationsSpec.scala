package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CollocationsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("hand-computed PMI on a tiny corpus") {
    // tokens: "x y" always adjacent; "p", "q" frequent but never adjacent
    val docs = Seq("x y p", "x y q", "p q x y", "q p").toDF("text")
    // N = 12 tokens, M = 8 bigrams
    // c_xy = 3, c_x = 3, c_y = 3 -> pmi = log2((3/8)/((3/12)^2)) = log2(6)
    val got = Collocations.pmiTopK(docs, "text", minCount = 2, topK = 10)
      .collect().map(r => ((r.getString(1), r.getString(0)), r.getLong(2), r.getDouble(5)))
    // NOTE column order in select: a, b, ... — fix tuple accordingly
    val byPair = Collocations.pmiTopK(docs, "text", 2, 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(5))).toSeq
    val xy = byPair.find(_._1 == ("x", "y")).get
    assert(xy._2 === 3L)
    val expected = math.log((3.0 / 8.0) / ((3.0 / 12.0) * (3.0 / 12.0))) / math.log(2.0)
    assert(math.abs(xy._3 - (math.rint(expected * 1e6) / 1e6)) < 1e-9)
    // rare pairs below minCount are excluded
    assert(!byPair.exists(_._1 == ("p", "q")))
    assert(got.nonEmpty)
  }

  test("ordering is (pmi DESC, a, b) and topK caps output") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Collocations.pmiTopK(docs, "text", minCount = 5, topK = 15).collect()
    assert(r.length === 15)
    val keys = r.map(x => (-x.getDouble(5), x.getString(0), x.getString(1))).toSeq
    assert(keys === keys.sorted)
    // exactness: every row satisfies the PMI formula against its own counts
    val totals = docs.select(graft.functions.TextAnalysis.tokens(col("text")).as("w"))
    val n = totals.select(explode(col("w"))).count().toDouble
    val m = totals.where(size(col("w")) >= 2)
      .select((size(col("w")) - 1).cast("long").as("k")).agg(sum("k")).head().getLong(0).toDouble
    r.foreach { x =>
      val want = math.log((x.getLong(2) / m) /
        ((x.getLong(3) / n) * (x.getLong(4) / n))) / math.log(2.0)
      assert(math.abs(x.getDouble(5) - math.rint(want * 1e6) / 1e6) < 1e-6)
    }
  }
}
