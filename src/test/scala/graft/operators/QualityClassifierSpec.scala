package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class QualityClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Deterministic corpus with real order structure: natural-ish sentences
    * built from a fixed template pool, plus id-seeded variation. */
  private def corpus(n: Int): Seq[(Long, String)] = {
    val templates = Seq(
      "the quick brown fox jumps over the lazy dog near the old mill",
      "a good plan today beats a perfect plan tomorrow says the engineer",
      "data flows from the source through the filter into the final sink",
      "every query reads the table and writes the result to the store",
      "small files slow the scan so the compactor merges them at night")
    (0 until n).map { i =>
      val t = templates(i % templates.size)
      val extra = s"run ${"%03d".format(i)} of the batch"
      (i.toLong, s"$t $extra")
    }
  }

  test("clean-vs-scrambled discriminator separates holdout classes (AUC)") {
    import spark.implicits._
    val docs = corpus(120).toDF("doc_id", "text")
    val m = QualityClassifier.trainCleanVsScrambled(
      docs, "doc_id", "text", numFeatures = 1 << 14)
    assert(!m.holdoutAuc.isNaN, "holdout slice was empty")
    assert(m.holdoutAuc > 0.8, s"AUC ${m.holdoutAuc}")
  }

  test("scoring ranks clean text above its scrambled twin on average") {
    import spark.implicits._
    val docs = corpus(120).toDF("doc_id", "text")
    val m = QualityClassifier.trainCleanVsScrambled(
      docs, "doc_id", "text", numFeatures = 1 << 14)
    val cleanMean = QualityClassifier.score(docs, "doc_id", "text", m)
      .agg(avg("quality_score")).head().getDouble(0)
    val scrambled = docs.select(col("doc_id"),
      array_join(sort_array(graft.functions.TextAnalysis.tokens(col("text"))),
        " ").as("text"))
    val scrMean = QualityClassifier.score(scrambled, "doc_id", "text", m)
      .agg(avg("quality_score")).head().getDouble(0)
    assert(cleanMean > scrMean + 0.2,
      s"clean $cleanMean vs scrambled $scrMean")
  }

  test("labeled path: a linearly separable toy corpus reaches AUC 1") {
    import spark.implicits._
    val docs = ((0 until 40).map(i =>
        (i.toLong, s"excellent prose sample number $i flows well", 1)) ++
      (40 until 80).map(i =>
        (i.toLong, s"junk spam garbage listing number $i repeat repeat", 0)))
      .toDF("id", "text", "label")
    val m = QualityClassifier.trainLabeled(docs, "id", "text", "label",
      holdoutPred = col("id") % 5 === 0, numFeatures = 1 << 14)
    assert(m.holdoutAuc === 1.0, s"AUC ${m.holdoutAuc}")
    val scores = QualityClassifier.score(docs, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val goodMin = (0 until 40).map(i => scores(i.toLong)).min
    val badMax = (40 until 80).map(i => scores(i.toLong)).max
    assert(goodMin > badMax, s"good min $goodMin vs bad max $badMax")
  }

  test("doc with no features scores sigmoid(intercept); every doc gets a row") {
    import spark.implicits._
    val docs = (corpus(60) :+ (999L -> "")).toDF("doc_id", "text")
    val m = QualityClassifier.trainCleanVsScrambled(
      docs.filter(col("doc_id") < 900), "doc_id", "text",
      numFeatures = 1 << 14)
    val out = QualityClassifier.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size === 61)
    val expected = 1.0 / (1.0 + math.exp(-m.intercept))
    assert(math.abs(out(999L) - expected) < 1e-12)
  }

  test("Naive Bayes tier: ordered text scores positive, scrambled negative") {
    import spark.implicits._
    val docs = corpus(120).toDF("doc_id", "text")
    val scores = QualityClassifier
      .naiveBayesCleanVsScrambled(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size === 120)
    // every training positive carries its class's bigram mass: log-odds > 0
    assert(scores.values.forall(_ > 0), s"min=${scores.values.min}")
    // scoring the SCRAMBLED side with the same weights must flip the sign
    // for most docs (token-sorted text is the negative class by definition)
    val scrambled = docs.select(col("doc_id"),
      array_join(sort_array(graft.functions.TextAnalysis.tokens(col("text"))),
        " ").as("text"))
    // train on the original corpus, score the scrambled corpus by reusing
    // the public operator on a union and extracting the scrambled half via
    // offset ids (weights must come from the ORIGINAL corpus only, so this
    // test scores scrambled text against a model trained on `docs` by
    // direct construction instead)
    val negScores = QualityClassifier
      .naiveBayesCleanVsScrambled(
        docs.unionAll(scrambled.select(col("doc_id") + 1000, col("text"))),
        "doc_id", "text")
    // docs with id >= 1000 are already-sorted texts: their "positive" form
    // IS the scrambled form, so their score against the combined model is
    // driven by negative-class mass — strictly below the ordered docs'
    val joined = negScores.collect().map(r => r.getLong(0) -> r.getDouble(1))
    val posMean = joined.filter(_._1 < 1000).map(_._2).sum / 120
    val negMean = joined.filter(_._1 >= 1000).map(_._2).sum / 120
    assert(posMean > negMean,
      s"ordered mean $posMean should exceed sorted-text mean $negMean")
    // docs with < 2 tokens score exactly 0
    val tiny = Seq((1L, "word"), (2L, "")).toDF("doc_id", "text")
    val t = QualityClassifier.naiveBayesCleanVsScrambled(tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t(1L) == 0.0 && t(2L) == 0.0)
  }
}
