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
      wordCounts.toSeq.map { case (w, c) => (Bpe.symbolize(w).toVector, c) }
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
        // tie-break in UTF-8 BYTE order to match Spark's binary string
        // ordering (Java compareTo diverges on non-BMP vs [U+E000,U+FFFF])
        def u8 = (s: String) => s.getBytes("UTF-8")
        def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < a.length && i < b.length) {
            val c = (a(i) & 0xff) - (b(i) & 0xff)
            if (c != 0) return c < 0
            i += 1
          }
          a.length < b.length
        }
        val ((l, r), c) = pairCounts.toSeq.sortWith { case (((a1, b1), n1), ((a2, b2), n2)) =>
          if (n1 != n2) n1 > n2
          else if (a1 != a2) byteLt(u8(a1), u8(a2))
          else byteLt(u8(b1), u8(b2))
        }.head
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

  test("non-BMP tie-break matches the reference (UTF-8 byte order)") {
    // U+1F600 sorts BEFORE U+FFFD in Java's UTF-16 compareTo (lead
    // surrogate 0xD83D < 0xFFFD) but AFTER it in UTF-8 bytes
    // (F0 9F 98 80 vs EF BF BD). Four pairs all tied at count 2 — the
    // tie-break alone decides the first merge, which must be
    // (U+FFFD, </w>) under byte order, not (U+1F600, </w>).
    val emoji = new String(Character.toChars(0x1F600))
    val repl = "�"
    val texts = Seq(s"$emoji$emoji $repl$repl", s"$emoji$emoji $repl$repl")
    val got = Bpe.train(texts.toDF("text"), "text", numMerges = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(tokenize(texts), 1)
    assert(got === want)
    assert(got.head._2 === repl, s"UTF-8 byte order must pick $repl first, got ${got.head}")
    // and the emoji is ONE symbol (code-point symbolization), not two
    // surrogate halves
    assert(Bpe.segmentWord(emoji, Nil) === Seq(emoji, "</w>"))
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
