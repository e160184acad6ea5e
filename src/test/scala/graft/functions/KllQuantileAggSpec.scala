package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The KLL sketch's contract is a RANK bound, not a value bound: every
  * estimate is an actual input value whose true rank is within eps·n of the
  * quantile target. These specs measure the bound on adversarial input
  * orders (sorted, reverse, deterministic shuffle), through merges, and
  * through Spark's partial-aggregation path. */
class KllQuantileAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Qs = Array(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
  private val K = 800
  // conservative deterministic-KLL bound for k=800 at n<=2e5; observed
  // error is typically <0.3% — the assertion allows 1.5%
  private val Eps = 0.015

  /** True rank error for an estimate over values 1..n: value v has rank v. */
  private def assertRankBound(sk: KllSketch, n: Long): Unit =
    Qs.foreach { q =>
      val est = sk.quantile(q)
      val err = math.abs(est - q * n) / n.toDouble
      assert(err <= Eps, f"q=$q est=$est n=$n rankErr=$err%.4f > $Eps")
    }

  private def sketchOf(xs: Iterator[Double], k: Int = K): KllSketch = {
    val s = new KllSketch(k)
    xs.foreach(s.update)
    s
  }

  /** Deterministic pseudo-shuffle of 1..n (fixed LCG permutation walk). */
  private def shuffled(n: Int): Array[Double] = {
    val a = Array.tabulate(n)(i => (i + 1).toDouble)
    var state = 0x9e3779b97f4a7c15L
    var i = n - 1
    while (i > 0) {
      state = state * 6364136223846793005L + 1442695040888963407L
      val j = ((state >>> 33) % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  test("rank bound holds on sorted, reverse-sorted, and shuffled input") {
    val n = 100000
    assertRankBound(sketchOf((1 to n).iterator.map(_.toDouble)), n)
    assertRankBound(sketchOf((n to 1 by -1).iterator.map(_.toDouble)), n)
    assertRankBound(sketchOf(shuffled(n).iterator), n)
  }

  test("exact n, exact min/max, bounded state") {
    val n = 100000
    val s = sketchOf(shuffled(n).iterator)
    assert(s.n === n)
    assert(s.quantile(0.0) === 1.0)
    assert(s.quantile(1.0) === n.toDouble)
    // KLL state: ~3k doubles regardless of n (geometric capacities)
    assert(s.totalRetained <= 4 * K, s"retained ${s.totalRetained} > ${4 * K}")
  }

  test("rank bound survives merging many partial sketches") {
    val n = 200000
    val data = shuffled(n)
    val parts = 37
    val partials = (0 until parts).map { p =>
      sketchOf(data.iterator.zipWithIndex.collect {
        case (v, i) if i % parts == p => v
      })
    }
    // fold in a fixed but non-trivial order (pairwise tree merge)
    def tree(ss: Seq[KllSketch]): KllSketch =
      if (ss.length == 1) ss.head
      else tree(ss.grouped(2).map {
        case Seq(a, b) => a.mergeWith(b)
        case Seq(a) => a
      }.toSeq)
    val merged = tree(partials)
    assert(merged.n === n)
    assertRankBound(merged, n)
  }

  test("empty sketch yields NaN; single value answers every quantile") {
    val e = new KllSketch(K)
    assert(e.quantile(0.5).isNaN)
    val s1 = sketchOf(Iterator(42.0))
    Qs.foreach(q => assert(s1.quantile(q) === 42.0))
  }

  test("via Spark udaf: grouped quantiles within rank bound, nulls skipped") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).flatMap { i =>
      Seq(("a", java.lang.Double.valueOf(i.toDouble)),
          ("b", java.lang.Double.valueOf((2 * i).toDouble)))
    } ++ Seq(("a", null.asInstanceOf[java.lang.Double]))
    val kll = udaf(new KllQuantileAgg(K, Array(0.5, 0.9)))
    val rows = df.toDF("g", "v").repartition(8)
      .groupBy($"g").agg(kll($"v").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // group a: values 1..n (null skipped) -> rank of estimate = value
    val a = rows("a")
    assert(math.abs(a(0) - 0.5 * n) / n <= Eps)
    assert(math.abs(a(1) - 0.9 * n) / n <= Eps)
    // group b: values 2,4,..,2n -> rank of estimate v is v/2
    val b = rows("b")
    assert(math.abs(b(0) / 2 - 0.5 * n) / n <= Eps)
    assert(math.abs(b(1) / 2 - 0.9 * n) / n <= Eps)
  }

  test("heavy duplication does not break the bound (skewed multiset)") {
    // 90% of mass is one value; quantiles inside the plateau must return it
    val n = 50000
    val xs = Array.fill((n * 0.9).toInt)(7.0) ++
      (1 to (n * 0.1).toInt).map(i => 1000.0 + i)
    val s = sketchOf(shuffled(xs.length).iterator.map(i => xs(i.toInt - 1)))
    Seq(0.1, 0.5, 0.85).foreach(q => assert(s.quantile(q) === 7.0))
    assert(s.quantile(0.99) > 1000.0)
  }

  test("total retained weight equals n exactly (even-prefix compaction)") {
    // an odd-length compaction retains its leftover at the current level,
    // so Σ len(level_h)·2^h never drifts from n — across sizes chosen to
    // hit odd buffers at multiple levels, and through merges
    def weight(s: KllSketch): Long =
      (0 until s.levels.length).map(h => s.levels(h).length.toLong << h).sum
    for (n <- Seq(1, 7, 801, 4097, 100001)) {
      val s = sketchOf(shuffled(n).iterator)
      assert(s.n == n && weight(s) == n, s"n=$n weight=${weight(s)}")
    }
    val merged = sketchOf((1 to 33333).iterator.map(_.toDouble))
      .mergeWith(sketchOf((1 to 4445).iterator.map(_.toDouble)))
    assert(weight(merged) == merged.n && merged.n == 33333 + 4445)
  }
}
