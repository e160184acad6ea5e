package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.MisraGriesAgg

class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Reference MG run (sequential) for the completeness property. */
  private def mgCandidates(items: Seq[String], k: Int): Set[String] = {
    val agg = new MisraGriesAgg(k)
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf).keySet
  }

  test("MG summary: every item with freq > N/k survives (fuzzed, incl. merges)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val vocab = (0 until 50).map(i => s"t$i")
      val weights = vocab.indices.map(i => 1.0 / (i + 1))
      val total = weights.sum
      val items = Seq.fill(2000) {
        var x = rnd.nextDouble() * total; var i = 0
        while (x > weights(i)) { x -= weights(i); i += 1 }
        vocab(i)
      }
      val k = 5 + rnd.nextInt(20)
      val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = items.size.toLong
      // sequential path
      val seq = mgCandidates(items, k)
      // merged path: split into 4 chunks, sketch each, pairwise merge
      val agg = new MisraGriesAgg(k)
      val parts = items.grouped(items.size / 4 + 1).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = agg.finish(parts.reduce(agg.merge)).keySet
      for ((t, f) <- exact if f > n / k) {
        assert(seq.contains(t), s"trial $trial: sequential MG(k=$k) lost $t (f=$f, N/k=${n / k})")
        assert(merged.contains(t), s"trial $trial: merged MG(k=$k) lost $t (f=$f, N/k=${n / k})")
      }
      assert(merged.size <= k, s"merged summary exceeded capacity: ${merged.size} > $k")
    }
  }

  test("frequentValues == brute-force GROUP BY/HAVING (fuzzed, skewed data)") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val items = Seq.fill(5000)(s"v${math.min(rnd.nextInt(400), rnd.nextInt(400))}")
      val df = items.toDF("value").repartition(7)
      val phi = 0.005 + rnd.nextDouble() * 0.02
      val got = HeavyHitters
        .frequentValues(df, "value", phi, math.ceil(2.0 / phi).toInt)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val n = items.size
      val thr = math.ceil(phi * n).toLong
      val want = items.groupBy(identity)
        .collect { case (v, xs) if xs.size >= thr => (v, xs.size.toLong) }.toSet
      assert(got === want, s"trial $trial phi=$phi")
    }
  }

  test("frequentTokens: exact counts on a hand-built corpus") {
    val df = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the dog ate the cat food",
      3L -> "a cat and a dog").toDF("doc_id", "text")
    // 17 tokens total; "the" x4, "cat" x3, "a" x2, "dog" x2, rest x1
    val got = HeavyHitters.frequentTokens(df, "text", phi = 0.17)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("the", 4L), ("cat", 3L))) // thr = ceil(0.17*17) = 3
  }

  test("float-boundary threshold: phi*N mathematically integer keeps the boundary hitter") {
    // phi=0.1, N=30: 0.1*30 = 3.0000000000000004 in doubles — without the
    // epsilon the ceil lands on 4 and a value with exactly 3 occurrences
    // (exactly the phi share) is wrongly dropped
    val values = (Seq.fill(3)("edge") ++ (1 to 27).map(i => s"filler$i")).toDF("value")
    val got = HeavyHitters.frequentValues(values, "value", phi = 0.1, capacity = 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("edge", 3L)), s"boundary hitter must survive, got $got")
  }

  test("plan: second phase joins broadcast and no driver action is needed") {
    val df = Seq.fill(100)(s"x${util.Random.nextInt(5)}").toDF("value")
    val plan = HeavyHitters.frequentValues(df, "value", 0.05, 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"candidate join should broadcast:\n$plan")
  }

  test("guards: phi range, capacity floor, reserved output names") {
    val df = Seq("a").toDF("value")
    intercept[IllegalArgumentException](HeavyHitters.frequentTokens(df, "value", 0.0))
    intercept[IllegalArgumentException](HeavyHitters.frequentValues(df, "value", 0.1, 3))
    val clash = Seq("a").toDF("n")
    intercept[IllegalArgumentException](HeavyHitters.frequentValues(clash, "n", 0.1, 40))
  }
}
