package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ImportanceSamplingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- single-threaded reference of the documented contract ------------
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def referenceWeights(docs: Seq[(Long, String, Boolean)],
                               hexChars: Int, alpha: Double): Map[Long, Double] = {
    val b = math.pow(16.0, hexChars.toDouble)
    def feats(text: String): Seq[String] = {
      val w = toks(text)
      (w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .map(g => md5Hex(g).take(hexChars))
    }
    val all = docs.flatMap { case (id, t, tgt) => feats(t).map(f => (id, tgt, f)) }
    val cr = all.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tr = all.size.toLong
    val tt = all.count(_._2).toLong
    docs.map { case (id, t, _) =>
      val w = feats(t).groupBy(identity).view.mapValues(_.size).toMap.map {
        case (bk, n) =>
          n * (math.log((ct.getOrElse(bk, 0L) + alpha) / (tt + alpha * b))
            - math.log((cr(bk) + alpha) / (tr + alpha * b)))
      }.sum
      id -> BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private val corpus = Seq(
    (1L, "spark shuffle join broadcast spark shuffle", true),
    (2L, "spark join agg shuffle window spark", true),
    (3L, "cats dogs birds fish cats dogs", false),
    (4L, "spark shuffle broadcast join window agg", false), // target-like
    (5L, "birds fish lizards cats dogs birds", false),      // raw-like
    (6L, "", false))                                        // empty text

  test("log weights match the single-threaded reference exactly (rounded 6dp)") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val got = ImportanceSampling
      .dsirLogWeights(df, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = referenceWeights(corpus, hexChars = 3, alpha = 0.5) + (6L -> 0.0)
    assert(got.keySet === want.keySet)
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 2e-6, s"doc $k: got ${got(k)}, want $v")
  }

  test("target-like raw documents outrank raw-like ones; empty doc weighs 0") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val w = ImportanceSampling
      .dsirLogWeights(df, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(4L) > w(5L))  // shares the target vocabulary
    assert(w(4L) > w(3L))
    assert(w(6L) === 0.0)
  }

  test("resample selects exactly n docs by (weight desc, id asc), flag for every doc") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val out = ImportanceSampling
      .dsirResample(df, "doc_id", "text", col("is_tgt"), n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.length === corpus.length)
    assert(out.count(_._3 == 1) === 3)
    val byRank = out.sortBy { case (id, w, _) => (-w, id) }
    assert(byRank.take(3).forall(_._3 == 1), s"top-3 not all selected: ${byRank.toSeq}")
    assert(byRank.drop(3).forall(_._3 == 0))
  }

  test("n >= corpus size selects everything") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val out = ImportanceSampling
      .dsirResample(df, "doc_id", "text", col("is_tgt"), n = 100)
      .collect()
    assert(out.forall(_.getInt(2) == 1))
  }
}
