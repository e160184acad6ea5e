package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class SamplingRankingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("stratifiedExact keeps exactly ceil(f*n) rows per stratum, deterministically") {
    val df = (1L to 100L).map(i => (if (i <= 40) "a" else "b", i))
      .toDF("src", "id")
    val s1 = Sampling.stratifiedExact(df, "src", "id", 0.25)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === Map("a" -> 10L, "b" -> 15L)) // ceil(40*.25), ceil(60*.25)
    // repartitioned input selects the SAME rows
    val ids1 = Sampling.stratifiedExact(df, "src", "id", 0.25)
      .select("id").as[Long].collect().sorted
    val ids2 = Sampling.stratifiedExact(df.repartition(7), "src", "id", 0.25)
      .select("id").as[Long].collect().sorted
    assert(ids1 sameElements ids2)
  }

  test("deterministicSample is stable across partitioning and ~fraction sized") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.3)
      .select("id").as[Long].collect().sorted
    val b = Sampling.deterministicSample(df.repartition(11), "id", 0.3)
      .select("id").as[Long].collect().sorted
    assert(a sameElements b)
    assert(a.length > 2000 * 0.3 - 100 && a.length < 2000 * 0.3 + 100)
    // fraction 1.0 keeps everything; 0.0 keeps nothing
    assert(Sampling.deterministicSample(df, "id", 1.0).count() === 2000)
    assert(Sampling.deterministicSample(df, "id", 0.0).count() === 0)
  }

  test("stratifiedExact tolerates input columns named like its temp columns") {
    val df = (1 to 20).map(i => (s"s${i % 2}", i.toLong, s"keep$i"))
      .toDF("source", "doc_id", "__rk")
    val out = Sampling.stratifiedExact(df, "source", "doc_id", 0.5)
    assert(out.columns.toSeq === Seq("source", "doc_id", "__rk"))
    assert(out.count() === 10)
    // the user column survives untouched
    assert(out.select("__rk").collect().forall(_.getString(0).startsWith("keep")))
  }

  test("exemplars: exactly k per group, stable across partitioning, guarded") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
    val a = Sampling.exemplars(df.repartition(3), "grp", "id", k = 4)
      .select("grp", "id", "exemplar_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val b = Sampling.exemplars(df.repartition(11), "grp", "id", k = 4)
      .select("grp", "id", "exemplar_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === b, "selection must not depend on physical layout")
    assert(a.groupBy(_._1).forall(_._2.size == 4))
    assert(a.map(_._3).subsetOf(Set(1, 2, 3, 4)))
    // k larger than a group -> whole group, no padding
    val small = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(Sampling.exemplars(small, "grp", "id", k = 10).count() === 2)
    // reserved output name refused
    val clash = Seq((1L, "x", 9)).toDF("id", "grp", "exemplar_rank")
    intercept[IllegalArgumentException](Sampling.exemplars(clash, "grp", "id", 1))
  }

  test("mixtureSample hits target shares within hash-sampling noise") {
    // stratum a: 300 rows x 10 tokens = 3000; b: 100 x 10 = 1000; c: 50 x 10 = 500
    val df = ((1L to 300L).map(i => ("a", i)) ++ (301L to 400L).map(i => ("b", i))
      ++ (401L to 450L).map(i => ("c", i))).toDF("src", "id")
      .withColumn("tok", lit(10L))
    // budget 1500, uniform thirds -> a: frac 500/3000, b: 500/1000, c: min(1, 500/500)=1
    val out = Sampling.mixtureSample(df, "src", "id", col("tok"),
      Map("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3)), 1500L)
    val n = out.groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("c") === 50L, s"undersized stratum must keep everything: $n")
    assert(n("a") > 25 && n("a") < 75, s"a ~ 50 expected: $n")      // 300 * 1/6
    assert(n("b") > 30 && n("b") < 70, s"b ~ 50 expected: $n")      // 100 * 1/2
    // deterministic across partitioning
    val ids1 = out.select("id").as[Long].collect().sorted
    val ids2 = Sampling.mixtureSample(df.repartition(13), "src", "id", col("tok"),
        Map("a" -> (1.0 / 3), "b" -> (1.0 / 3), "c" -> (1.0 / 3)), 1500L)
      .select("id").as[Long].collect().sorted
    assert(ids1 sameElements ids2)
    // strata missing from the target mix are dropped
    val dropped = Sampling.mixtureSample(df, "src", "id", col("tok"),
      Map("a" -> 1.0), 1500L)
    assert(dropped.select("src").distinct().collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("leakageSafeSplit boundary fractions: 0.0 all train, 1.0 all holdout") {
    val docs = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val all1 = Sampling.leakageSafeSplit(docs, pairs, "doc_id", "id_a", "id_b", 1.0)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all1 === Map("holdout" -> 50L))
    val all0 = Sampling.leakageSafeSplit(docs, pairs, "doc_id", "id_a", "id_b", 0.0)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all0 === Map("train" -> 50L))
  }

  test("leakageSafeSplit never splits a near-dup component across sides") {
    val docs = (1L to 200L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    // chain pairs clustering ids into groups of 4: {1..4}, {5..8}, ...
    val pairs = (1L to 199L).filter(i => i % 4 != 0).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id", "id_a", "id_b", 0.3)
    // each component lands entirely on one side
    val mixed = out.groupBy("component")
      .agg(countDistinct("split").as("sides")).filter(col("sides") > 1).count()
    assert(mixed === 0L)
    // both sides populated, holdout roughly 30%
    val n = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n.keySet === Set("train", "holdout"))
    assert(n("holdout") > 20 && n("holdout") < 120, s"holdout size: $n")
    // deterministic across partitioning
    val h1 = out.filter(col("split") === "holdout")
      .select("doc_id").as[Long].collect().sorted
    val h2 = Sampling.leakageSafeSplit(docs.repartition(7), pairs,
        "doc_id", "id_a", "id_b", 0.3)
      .filter(col("split") === "holdout").select("doc_id").as[Long].collect().sorted
    assert(h1 sameElements h2)
  }

  test("tfidfTopTerms ranks rare terms above common ones") {
    val df = Seq(
      (1L, "common common common rare"),
      (2L, "common shared words here"),
      (3L, "common shared other thing")).toDF("doc_id", "text")
    val top = TextRanking.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // 'common' appears in all 3 docs -> idf = ln(1) = 0; doc 1's top term
    // must be 'rare' (df=1) despite tf('common')=3
    assert(top(1L) === "rare")
    // ties broken by term ascending for equal rounded scores
    val doc2 = TextRanking.tfidfTopTerms(df, "doc_id", "text", k = 3)
      .filter(col("id") === 2L).orderBy("rank")
      .collect().map(_.getString(2))
    assert(doc2.toSeq === Seq("here", "words", "shared"))
  }

  test("bm25TopK matches the Okapi closed form on a hand-checked corpus") {
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date"),
      (4L, "")).toDF("doc_id", "text")
    val q = Seq((100L, "apple cherry")).toDF("qid", "qtext")
    val out = TextRanking.bm25TopK(df, "doc_id", "text", q, "qid", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // hand computation: N=4, avgdl=(3+2+4+0)/4=2.25, k1=1.2, b=0.75
    val N = 4.0; val avgdl = 2.25; val k1 = 1.2; val b = 0.75
    def idf(dfT: Int) = math.log(1.0 + (N - dfT + 0.5) / (dfT + 0.5))
    def term(tf: Int, dl: Int, dfT: Int) =
      idf(dfT) * tf * (k1 + 1) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val expect = Map(
      1L -> term(2, 3, 1),               // apple df=1, tf=2 in doc1 (len 3)
      2L -> term(1, 2, 2),               // cherry df=2, tf=1 in doc2 (len 2)
      3L -> term(3, 4, 2))               // cherry tf=3 in doc3 (len 4)
    val got = out.map(r => r._3 -> r._4).toMap
    assert(got.keySet === expect.keySet, "doc4 (empty) and no-overlap docs absent")
    expect.foreach { case (id, v) =>
      assert(math.abs(got(id) - math.rint(v * 1e6) / 1e6) < 1e-9, s"doc $id")
    }
    // ranking: doc1 (rare apple, tf 2) must beat the cherry docs
    assert(out.minBy(_._2)._3 === 1L)
    // self-retrieval sanity: a doc's own text as the query ranks it first
    val self = TextRanking.bm25TopK(df, "doc_id", "text",
        Seq((3L, "cherry cherry cherry date")).toDF("qid", "qtext"),
        "qid", "qtext", k = 1).head()
    assert(self.getLong(2) === 3L)
  }

  test("rrfFuse: hand-checked fusion, one-list docs, id tie-break, top-k cut") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3))
      .toDF("q_id", "id", "rank")
    val out = TextRanking.rrfFuse(lex, sem, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    def rrf(rs: Int*) = math.rint(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    // doc11: ranks (2,1) — 1/62+1/61; doc10: (1,3) — 1/61+1/63; both beat
    // the single-list docs 12 (1/63) and 13 (1/62); 13 > 12 but k=3 cuts 12
    assert(out.toSeq === Seq(
      (1L, 1, 11L, rrf(2, 1)),
      (1L, 2, 10L, rrf(1, 3)),
      (1L, 3, 13L, rrf(2))))
    // null source ranks surface for one-list docs
    val r13 = TextRanking.rrfFuse(lex, sem, k = 3)
      .filter(col("id") === 13L).head()
    assert(r13.isNullAt(r13.fieldIndex("rank_a")) &&
      r13.getInt(r13.fieldIndex("rank_b")) === 2)
    // exact tie (same rank in mirrored lists) breaks by id: swap lists
    val a = Seq((1L, 20L, 1), (1L, 21L, 2)).toDF("q_id", "id", "rank")
    val b = Seq((1L, 21L, 1), (1L, 20L, 2)).toDF("q_id", "id", "rank")
    val tied = TextRanking.rrfFuse(a, b, k = 2).orderBy("rank")
      .collect().map(_.getLong(2))
    assert(tied.toSeq === Seq(20L, 21L))
  }

  test("diversitySample: per-cell cap, full cell coverage, layout stability") {
    import spark.implicits._
    // two dense blobs + a sparse one: equal-per-cell selection must not
    // mirror density
    val rnd = new scala.util.Random(11)
    def blob(center: Array[Double], n: Int, from: Int) =
      (0 until n).map { i =>
        ((from + i).toLong,
          center.map(c => (c + rnd.nextGaussian() * 0.05).toFloat))
      }
    val emb = (blob(Array(1.0, 0.0, 0.0), 60, 0) ++
        blob(Array(0.0, 1.0, 0.0), 60, 100) ++
        blob(Array(0.0, 0.0, 1.0), 6, 200))
      .toDF("vec_id", "embedding")
    val out = Sampling.diversitySample(emb, "vec_id", "embedding",
        numCells = 4, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // cap respected and ranks dense within each cell
    out.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.length <= 3, s"cell $cell over cap")
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
    }
    // every nonempty cell is represented: compare against the number of
    // distinct cells the full assignment produces (cells come from data)
    val cells = out.map(_._2).distinct
    assert(cells.nonEmpty && cells.length <= 4)
    // stability under partition layout
    val out2 = Sampling.diversitySample(emb.repartition(7), "vec_id",
        "embedding", numCells = 4, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet === out2.toSet)
  }

  test("capPerGroup keeps the top-n per group with deterministic tiebreak") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L), (6L, "c", 10L))
      .toDF("id", "grp", "sz")
    val out = Sampling.capPerGroup(df, "grp", 2, Seq(col("sz").desc, col("id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    // group a: sz 300 ties between id 2 and 4 -> id ASC breaks it
    assert(out === Set((2L, "a", 1), (4L, "a", 2), (5L, "b", 1), (6L, "c", 1)))
    // stability under partition layout
    val out2 = Sampling.capPerGroup(df.repartition(5), "grp", 2,
        Seq(col("sz").desc, col("id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3))).toSet
    assert(out === out2)
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(df, "grp", 0, Seq(col("id")))
    }
  }

  test("temperatureWeights: alpha<1 upweights small sources; alpha=1 is proportional") {
    // source a: 8 docs x 100 tokens = 800; source b: 1 doc x 100 = 100
    val df = ((1 to 8).map(i => ("a", 100L)) :+ ("b", 100L)).toDF("src", "toks")
    def weights(alpha: Double): Map[String, (Long, Long, Double, Double)] =
      Sampling.temperatureWeights(df, "src", "toks", alpha)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val w1 = weights(1.0)
    assert(math.abs(w1("a")._3 - 800.0 / 900) < 1e-6) // weights round to 6dp
    assert(math.abs(w1("b")._3 - 100.0 / 900) < 1e-6)
    // eff_epochs at alpha=1 with default budget (=total) is exactly 1
    assert(math.abs(w1("a")._4 - 1.0) < 1e-9 && math.abs(w1("b")._4 - 1.0) < 1e-9)
    val w03 = weights(0.3)
    val za = math.pow(800, 0.3); val zb = math.pow(100, 0.3)
    assert(math.abs(w03("b")._3 - zb / (za + zb)) < 1e-6)
    // the small source's share of the budget EXCEEDS its natural share
    assert(w03("b")._3 > 100.0 / 900)
    assert(w03("b")._4 > 1.0 && w03("a")._4 < 1.0) // b repeats, a is subsampled
    // counts/token sums exact
    assert(w03("a")._1 === 8L && w03("a")._2 === 800L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(df, "src", "toks", 0.0)
    }
  }

  test("tokenBudgetSelect equals the global greedy (priority desc, id asc) prefix") {
    // priorities with ties; sizes chosen so the budget cuts INSIDE a tie group
    val rows = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 10L), (3L, 0.9, 10L),
      (4L, 0.5, 10L), (5L, 0.5, 25L), (6L, 0.1, 5L))
    val df = rows.toDF("id", "q", "toks").repartition(3)
    def sel(budget: Long): Set[Long] =
      Sampling.tokenBudgetSelect(df, "id", "q", "toks", budget)
        .select("id").as[Long].collect().toSet
    def ref(budget: Long): Set[Long] = {
      var cum = 0L
      rows.sortBy { case (id, q, _) => (-q, id) }.flatMap { case (id, _, t) =>
        cum += t; if (cum <= budget) Some(id) else None
      }.toSet
    }
    for (b <- Seq(0L, 9L, 10L, 25L, 30L, 40L, 64L, 65L, 70L, 1000L))
      assert(sel(b) === ref(b), s"budget $b")
    // selected rows keep their original schema (composable downstream)
    assert(Sampling.tokenBudgetSelect(df, "id", "q", "toks", 30L).columns
      === Array("id", "q", "toks"))
  }
}
