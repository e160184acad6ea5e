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

  /** Single-threaded reference BPE — now shared with Verify's evidence
    * probe as [[Bpe.referenceTrain]]; the spec keeps this alias so every
    * assertion reads against the same ground truth. */
  private def refBpe(wordCounts: Map[String, Long], numMerges: Int,
                     minCount: Long = 2L): Seq[(Int, String, String, Long)] =
    Bpe.referenceTrain(wordCounts, numMerges, minCount)

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

  test("distributed fallback path (maxDriverPairs=0) matches the reference too") {
    val texts = Seq(
      "low lower lowest low low",
      "newer newest new new newer",
      "wider wide widest wider",
      "low newer wide lowest")
    val df = texts.toDF("text")
    // maxDriverPairs=0 forces the fully-distributed argmax loop
    val got = Bpe.train(df, "text", numMerges = 12, minCount = 2L, maxDriverPairs = 0)
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

  test("rank-based encodeWord equals replay-the-merge-list segmentWord (fuzz)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc𝄞"
    def randWord(): String =
      (1 to (1 + rnd.nextInt(8))).map { _ =>
        val cp = alphabet.codePointAt(
          alphabet.offsetByCodePoints(0, rnd.nextInt(4)))
        new String(Character.toChars(cp))
      }.mkString
    (1 to 30).foreach { _ =>
      val corpus = (1 to 40).map(_ => randWord())
      val wc = corpus.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val merges = Bpe.referenceTrain(wc, numMerges = 12, minCount = 2)
        .map(m => (m._2, m._3))
      val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
      corpus.distinct.foreach { w =>
        assert(Bpe.encodeWord(w, ranks).toSeq === Bpe.segmentWord(w, merges),
          s"word $w merges $merges")
      }
    }
  }

  test("distributed encode matches the driver reference on every doc") {
    val texts = Seq(
      "low low low lower lowest newest newest widest",
      "the low road the lowest toll",
      "  Mixed   CASE \t whitespace  ",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Bpe.train(df, "text", 10)
    val mergeSeq = merges.collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.encode(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getInt(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => Bpe.segmentWord(w, mergeSeq)).toSeq
      assert(got(i.toLong)._1 === want, s"doc $i")
      assert(got(i.toLong)._2 === want.length)
    }
  }

  test("decodeTokens inverts encode back to the normalized text") {
    import org.apache.spark.sql.functions._
    val texts = Seq("Low  LOW lower", "a 𝄞b c", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val merges = Bpe.train(df, "text", 6)
    val out = Bpe.encode(df, "id", "text", merges)
      .select(col("id"), Bpe.decodeTokens(col("tokens")).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(out(i.toLong) === want, s"doc $i")
    }
  }

  test("byte tier: symbolizeBytes is the hex of the space-prefixed UTF-8 bytes") {
    assert(Bpe.symbolizeBytes("ab").toSeq === Seq("20", "61", "62"))
    // é = C3 A9; the 𝄞 clef = F0 9D 84 9E — one symbol per BYTE
    assert(Bpe.symbolizeBytes("é").toSeq === Seq("20", "c3", "a9"))
    assert(Bpe.symbolizeBytes("𝄞").toSeq === Seq("20", "f0", "9d", "84", "9e"))
  }

  test("byte tier: distributed trainBytes reproduces the byte-level reference") {
    val texts = Seq(
      "low lower lowest low low",
      "newer newest new new newer",
      "wider wide widest wider",
      "low newer wide lowest")
    val got = Bpe.trainBytes(texts.toDF("text"), "text", numMerges = 12)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val want = Bpe.referenceTrain(tokenize(texts), 12,
      symbolizer = Bpe.symbolizeBytes)
    assert(got === want)
    assert(got.nonEmpty)
    // the word-boundary byte participates: some early merge starts at "20"
    assert(got.exists(_._2.startsWith("20")),
      s"expected a space-anchored merge (the Ġ-prefix convention), got $got")
  }

  test("byte tier: every string is encodable — unseen chars fall back to raw bytes") {
    val train = Seq("aa aa aa ab ab").toDF("text")
    val merges = Bpe.trainBytes(train, "text", 4)
    // 'é' and '𝄞' never appeared in training: word-internal BPE would
    // need <unk>; byte-level emits their raw byte symbols
    val df = Seq((0L, "aa éz𝄞")).toDF("id", "text")
    val out = Bpe.encodeBytes(df, "id", "text", merges)
      .select(Bpe.decodeBytesTokens(org.apache.spark.sql.functions.col("tokens")))
      .head().getString(0)
    assert(out === "aa éz𝄞")
  }

  test("byte tier: decodeBytesTokens inverts encodeBytes on multi-byte text") {
    import org.apache.spark.sql.functions._
    val texts = Seq("Low  LOW lower", "a 𝄞b c", "héllo héllo héllo wörld", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    // enough merges that multi-byte sequences merge PARTIALLY (a token may
    // end mid-character) — the unhex reassembly must still be exact
    val merges = Bpe.trainBytes(df, "text", 12)
    val out = Bpe.encodeBytes(df, "id", "text", merges)
      .select(col("id"), Bpe.decodeBytesTokens(col("tokens")).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(out(i.toLong) === want, s"doc $i")
    }
  }

  test("byte tier: encodeWord equals segmentWord under the byte symbolizer (fuzz)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abé𝄞"
    def randWord(): String =
      (1 to (1 + rnd.nextInt(8))).map { _ =>
        val cp = alphabet.codePointAt(
          alphabet.offsetByCodePoints(0, rnd.nextInt(4)))
        new String(Character.toChars(cp))
      }.mkString
    (1 to 30).foreach { _ =>
      val corpus = (1 to 40).map(_ => randWord())
      val wc = corpus.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val merges = Bpe.referenceTrain(wc, numMerges = 12, minCount = 2,
          symbolizer = Bpe.symbolizeBytes)
        .map(m => (m._2, m._3))
      val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
      corpus.distinct.foreach { w =>
        assert(Bpe.encodeWord(w, ranks, Bpe.symbolizeBytes).toSeq ===
          Bpe.segmentWord(w, merges, Bpe.symbolizeBytes),
          s"word $w merges $merges")
      }
    }
  }

  test("encode preserves a string id column's type and values") {
    val df = Seq(("a", "x y x y x y"), ("b", "x x")).toDF("sid", "text")
    val merges = Bpe.train(df, "text", 4)
    val out = Bpe.encode(df, "sid", "text", merges)
    assert(out.schema("sid").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(out.select("sid").collect().map(_.getString(0)).sorted
      === Array("a", "b"))
  }
}
