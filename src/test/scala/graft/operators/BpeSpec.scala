package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Single-threaded reference BPE (classic Sennrich formulation) over a
    * word-frequency map — the ground truth the distributed trainer must
    * reproduce exactly. */
  private def refBpe(wordCounts: Map[String, Long], numMerges: Int,
                     minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), c) = pairCounts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        if (c < minCount) done = true
        else {
          merges += ((rank, l, r, c))
          words = words.map { case (syms, cnt) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toVector, cnt)
          }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  private def tokenize(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  test("distributed train reproduces the single-threaded reference exactly") {
    val texts = Seq(
      "low lower lowest low low",
      "newer newest new new newer",
      "wider wide widest wider",
      "low newer wide lowest")
    val df = texts.toDF("text")
    val got = Bpe.train(df, "text", numMerges = 12)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val want = refBpe(tokenize(texts), 12)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("train is deterministic across runs") {
    val df = Seq("aa ab aa ab ba ba aa", "ab aa ba bb bb").toDF("text")
    val r1 = Bpe.train(df, "text", 6).collect().toSeq.map(_.toString)
    val r2 = Bpe.train(df, "text", 6).collect().toSeq.map(_.toString)
    assert(r1 === r2)
  }

  test("early stop when no pair reaches minCount") {
    // every word unique, each char pair occurs once -> nothing >= 2
    val df = Seq("ab cd ef").toDF("text")
    val out = Bpe.train(df, "text", numMerges = 10, minCount = 2L).collect()
    assert(out.isEmpty)
  }

  test("segmentWord applies learned merges in rank order") {
    val texts = Seq("low low low lower lowest")
    val df = texts.toDF("text")
    val merges = Bpe.train(df, "text", 8)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = Bpe.segmentWord("low", merges)
    // 'low</w>' occurs 3x standalone -> after enough merges it should
    // collapse to a single symbol
    assert(seg === Seq("low</w>"), s"got $seg with merges $merges")
  }
}
