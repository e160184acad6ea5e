package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("interleave: hand-checked Morton codes") {
    // b0=1 (01), b1=2 (10), 2 bits: bit0 of col0 -> pos0, bit0 of col1 ->
    // pos1, bit1 of col0 -> pos2, bit1 of col1 -> pos3 => 1 + 8 = 9
    val out = Seq((1, 2), (0, 0), (3, 3), (2, 1))
      .toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), bits = 2).as("zv"))
      .as[Long].collect()
    assert(out === Array(9L, 0L, 15L, 6L))
  }

  test("bucketIndex: boundary semantics are #cutoffs <= v") {
    val cuts = Array(10.0, 20.0)
    val out = Seq(5, 10, 15, 20, 25).toDF("v")
      .select(ZOrder.bucketIndex(col("v"), cuts).as("b"))
      .as[Int].collect()
    assert(out === Array(0, 1, 1, 2, 2))
  }

  test("quantileCutoffs: exact interpolated percentiles, monotone") {
    val df = (1 to 1600).map(i => (i, 1601 - i)).toDF("x", "y")
    val Seq(cx, cy) = ZOrder.quantileCutoffs(df, Seq("x", "y"), 16)
    assert(cx.length === 15 && cy.length === 15)
    assert(cx.sameElements(cx.sorted) && cy.sameElements(cy.sorted))
    // x uniform on 1..1600: cutoff j/16 = 1 + (1599 * j/16)
    for ((c, j) <- cx.zip(1 to 15))
      assert(math.abs(c - (1 + 1599.0 * j / 16)) < 1e-9, s"cutoff $j")
  }

  test("zorderBy preserves the exact row multiset and sorts zv in-partition") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val z = ZOrder.zorderBy(li, Seq("l_partkey", "l_suppkey"), 16, 8)
    assert(z.count() === li.count())
    val checksum = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(expr("bit_xor(xxhash64(l_orderkey, l_linenumber, l_partkey, l_suppkey))"))
        .head().getLong(0)
    assert(checksum(z) === checksum(li))
    // zv non-decreasing within each partition (physical row order)
    val sortedPerPart = z.select(col("zv")).rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
    assert(sortedPerPart.forall(s => s == s.sorted))
  }

  test("z-clustering prunes 2-D boxes ~3x+ better than natural layout") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    def partitionExtents(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.groupBy(spark_partition_id().as("p"))
        .agg(min(col("pk")), max(col("pk")), min(col("sk")), max(col("sk")))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val natural = partitionExtents(li.repartitionByRange(16,
      monotonically_increasing_id()))
    val zed = partitionExtents(
      ZOrder.zorderBy(li, Seq("pk", "sk"), 16, 16))
    val (pkMax, skMax) = (li.agg(max(col("pk"))).head().getLong(0),
      li.agg(max(col("sk"))).head().getLong(0))
    // 20 deterministic probe boxes, each ~1/8 of the range per dimension
    def hits(exts: Array[(Long, Long, Long, Long)]): Double = {
      val counts = (0 until 20).map { j =>
        val p0 = (j * 131L) % (pkMax - pkMax / 8 + 1)
        val s0 = (j * 37L) % (skMax - skMax / 8 + 1)
        val (p1, s1) = (p0 + pkMax / 8, s0 + skMax / 8)
        exts.count { case (pmin, pmax, smin, smax) =>
          pmax >= p0 && pmin <= p1 && smax >= s0 && smin <= s1 }
      }
      counts.sum.toDouble / (20.0 * exts.length)
    }
    val (hn, hz) = (hits(natural), hits(zed))
    assert(hz < 0.6 * hn,
      f"z-order pruning too weak: zorder=$hz%.3f natural=$hn%.3f")
  }
}
