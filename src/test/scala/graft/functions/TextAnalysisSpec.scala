package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class TextAnalysisSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).head().get(0)

  test("tokenCount: whitespace runs, leading/trailing space, empty") {
    assert(one("hello  world\n\tfoo", TextAnalysis.tokenCount(col("t"))) === 3)
    assert(one("   ", TextAnalysis.tokenCount(col("t"))) === 0)
    assert(one("", TextAnalysis.tokenCount(col("t"))) === 0)
    assert(one("one", TextAnalysis.tokenCount(col("t"))) === 1)
  }

  test("PII: email/url counts and scrub, urls redacted before emails") {
    val t = "mail a.b+c@ex-1.org or see https://h.io/p?q=1#f and x@y.co end"
    assert(one(t, TextAnalysis.emailCount(col("t"))) === 2)
    assert(one(t, TextAnalysis.urlCount(col("t"))) === 1)
    assert(one(t, TextAnalysis.scrubPii(col("t"))) ===
      "mail <EMAIL> or see <URL> and <EMAIL> end")
    // @userinfo inside a URL must not leave a mangled half-URL behind
    assert(one("go https://u.x@host.com/p now", TextAnalysis.scrubPii(col("t"))) ===
      "go <URL> now")
    // explicit port must be swallowed by the URL match too
    assert(one("at http://host.com:8080/p end", TextAnalysis.scrubPii(col("t"))) ===
      "at <URL> end")
    assert(one("no pii here", TextAnalysis.scrubPii(col("t"))) === "no pii here")
    assert(one("", TextAnalysis.emailCount(col("t"))) === 0)
  }

  test("topTokenCount: max multiplicity via row-local fold equals brute force") {
    assert(one("a b a c a b", TextAnalysis.topTokenCount(col("t"))) === 3L)
    assert(one("x", TextAnalysis.topTokenCount(col("t"))) === 1L)
    assert(one("", TextAnalysis.topTokenCount(col("t"))) === 0L)
    // tokens are lowercased: [a, a, aa, aa, aa] -> top multiplicity 3
    assert(one("A a aA Aa aa", TextAnalysis.topTokenCount(col("t"))) === 3L)
    // random fuzz vs a Scala-side brute force
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val toks = Array.fill(rnd.nextInt(50))("t" + rnd.nextInt(8))
      val expected = if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.length).max.toLong
      assert(one(toks.mkString(" "), TextAnalysis.topTokenCount(col("t"))) === expected)
    }
  }

  test("normalizeText: NFC composition, control/zero-width strip, whitespace collapse") {
    // decomposed e + combining acute composes to the single code point
    assert(one("cafe\u0301", TextAnalysis.normalizeText(col("t"))) === "caf\u00e9")
    // already-composed text unchanged
    assert(one("caf\u00e9", TextAnalysis.normalizeText(col("t"))) === "caf\u00e9")
    // zero-width space / joiner / BOM removed (joining the fragments)
    assert(one("a\u200bb \u200dc\ufeffd", TextAnalysis.normalizeText(col("t"))) === "ab cd")
    // C0 controls and DEL stripped; whitespace controls collapse instead
    assert(one("x\u0001y\u007fz", TextAnalysis.normalizeText(col("t"))) === "xyz")
    assert(one(" a\t\tb\r\nc  ", TextAnalysis.normalizeText(col("t"))) === "a b c")
    assert(one("", TextAnalysis.normalizeText(col("t"))) === "")
    assert(one("   ", TextAnalysis.normalizeText(col("t"))) === "")
  }

  test("repetition fractions: closed-form top/dup n-gram char masses") {
    // "a a a": normalized chars 5; bigram "a a" (3 chars) occurs 2x ->
    // top mass 6/5 (overlap double-counts, top is NOT clamped), dup IS
    // clamped to 1
    assert(one("a a a", TextAnalysis.topNgramCharFrac(col("t"), 2)) === 1.2)
    assert(one("a a a", TextAnalysis.dupNgramCharFrac(col("t"), 2)) === 1.0)
    // all bigrams unique: top tie between "x y" and "y z" breaks to the
    // byte-smallest ("x y", 3 chars of 5); nothing duplicated
    assert(one("x y z", TextAnalysis.topNgramCharFrac(col("t"), 2)) === 0.6)
    assert(one("x y z", TextAnalysis.dupNgramCharFrac(col("t"), 2)) === 0.0)
    // duplicated trigram: "a b c" (5 chars) x2 of "a b c a b c" (11 chars)
    assert(one("a b c a b c", TextAnalysis.dupNgramCharFrac(col("t"), 3))
      === 10.0 / 11.0)
    // fewer tokens than n -> 0; empty -> 0; case-folds before counting
    assert(one("a b", TextAnalysis.topNgramCharFrac(col("t"), 3)) === 0.0)
    assert(one("", TextAnalysis.topNgramCharFrac(col("t"), 2)) === 0.0)
    assert(one("A a", TextAnalysis.topNgramCharFrac(col("t"), 2)) === 1.0)
  }

  test("repetition fractions count Unicode code points, not UTF-16 units") {
    // tokens [𝄞a, 𝄞a, b]: normalized text has 2+1+2+1+1 = 7 code points;
    // "𝄞a 𝄞a" (5 cp) occurs once, "𝄞a b" (4 cp) once -> top tie breaks
    // on UTF-8 byte order: 'b' (0x62) < '𝄞' (0xF0...) so "𝄞a b" wins
    val t = "𝄞a 𝄞a b"
    assert(one(t, TextAnalysis.topNgramCharFrac(col("t"), 2)) === 4.0 / 7.0)
    assert(one(t, TextAnalysis.dupNgramCharFrac(col("t"), 2)) === 0.0)
    // the duplicated unigram 𝄞a: mass 2*2 of 7
    assert(one(t, TextAnalysis.dupNgramCharFrac(col("t"), 1)) === 4.0 / 7.0)
  }

  test("dupBigramFrac: repeated bigrams counted, short docs zero") {
    assert(one("a b a b a", TextAnalysis.dupBigramFrac(col("t"))) === 0.5) // 4 slots, 2 distinct
    assert(one("a b c d", TextAnalysis.dupBigramFrac(col("t"))) === 0.0)
    assert(one("one", TextAnalysis.dupBigramFrac(col("t"))) === 0.0)
    assert(one("", TextAnalysis.dupBigramFrac(col("t"))) === 0.0)
  }

  test("wordShingles: count, content, short-doc edge") {
    val sh = one("a b c d", TextAnalysis.wordShingles(col("t"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh === Seq("a b c", "b c d"))
    assert(one("a b", TextAnalysis.wordShingles(col("t"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq.isEmpty)
  }

  test("charShingles normalize whitespace and case") {
    val sh = one("AB  cd", TextAnalysis.charShingles(col("t"), 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh === Seq("ab ", "b c", " cd"))
  }

  test("charShingles edges: empty, short, tabs/newlines, non-BMP windows") {
    def sh(t: String, n: Int): Seq[String] =
      one(t, TextAnalysis.charShingles(col("t"), n))
        .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh("", 3).isEmpty)
    assert(sh("ab", 3).isEmpty)          // shorter than n
    assert(sh("   ", 2).isEmpty)         // whitespace-only
    assert(sh("\t a\nb \t", 3) === Seq("a b")) // all ws runs -> one space, ends trimmed
    // windows advance by CODEPOINT: the clef (non-BMP, 2 UTF-16 units)
    // is one position, never split into surrogate halves
    val clef = new String(Character.toChars(0x1D11E))
    assert(sh(s"a${clef}b", 2) === Seq(s"a$clef", s"${clef}b"))
    // distinct with first-occurrence order
    assert(sh("aaaa", 2) === Seq("aa"))
  }

  test("langId on real multilingual sentences") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog and it is fast" -> "en",
      "der hund ist nicht mit der katze und das ist gut" -> "de",
      "le chat est dans la maison et il est pour les enfants" -> "fr",
      "el perro es una mascota que vive en la casa por las noches" -> "es",
      "这是一个中文句子用来测试语言识别功能" -> "zh",
      "xyzzy plugh qwerty" -> "und")
    for ((text, expected) <- cases)
      assert(one(text, TextAnalysis.langId(col("t"))) === expected, s"text: $text")
  }

  test("qualityScore in [0,1]; clean prose beats punctuation soup") {
    val clean = "the quick brown fox jumps over the lazy dog and it is very fast " * 3
    val garbage = ";;;;!!!! ???? ....,,,, ;;;; !!!!"
    val qc = one(clean, TextAnalysis.qualityScore(col("t"))).asInstanceOf[Double]
    val qg = one(garbage, TextAnalysis.qualityScore(col("t"))).asInstanceOf[Double]
    assert(qc > qg)
    assert(qc >= 0 && qc <= 1 && qg >= 0 && qg <= 1)
  }

  test("fingerprint: whitespace/case-normalization invariance, content sensitivity") {
    val a = one("Hello   World", TextAnalysis.fingerprint(col("t")))
    val b = one("  hello world ", TextAnalysis.fingerprint(col("t")))
    val c = one("hello worle", TextAnalysis.fingerprint(col("t")))
    assert(a === b)
    assert(a !== c)
  }

  test("simhash: near-identical docs within small hamming distance, unrelated far") {
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val far = (200 to 260).map(i => s"other$i").mkString(" ")
    val sBase = one(base, TextAnalysis.simhash(col("t"))).asInstanceOf[Long]
    val sNear = one(near, TextAnalysis.simhash(col("t"))).asInstanceOf[Long]
    val sFar = one(far, TextAnalysis.simhash(col("t"))).asInstanceOf[Long]
    assert(ham(sBase, sNear) <= 8, s"near hamming ${ham(sBase, sNear)}")
    assert(ham(sBase, sFar) >= 16, s"far hamming ${ham(sBase, sFar)}")
  }

  test("fingerprint/simhash expressions survive codegen (no fallback errors) on a real table") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = d.select(TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.simhash(col("text")).as("sh")).agg(
      countDistinct(col("fp")), countDistinct(col("sh"))).head()
    assert(out.getLong(0) > 400L)
    assert(out.getLong(1) > 400L)
  }

  test("subwordTokens splits letter/digit runs") {
    val toks = one("abc123 def-x", TextAnalysis.subwordTokens(col("t")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(toks === Seq("abc", "123", "def", "-", "x"))
  }

  test("htmlExtract: scripts/styles/comments dropped, blocks break, entities decode") {
    import spark.implicits._
    val cases = Seq(
      ("<html><head><script>var x=1;\nalert(x)</script><style>p{}</style></head>" +
        "<body><h1>Title</h1><p>one two</p><p>three</p></body></html>",
        "Title\none two\nthree"),
      ("<div>a<br>b</div><ul><li>c</li><li>d</li></ul>", "a\nb\nc\nd"),
      ("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; &amp;lt; done",
        "x <tag> \"q\" 's' &lt; done"), // &amp;lt; -> &lt; (decode once, & last)
      ("<p>multi   space\t\ttabs</p>", "multi space tabs"),
      ("<!-- hidden --><P CLASS=\"a\">caps tag</P>", "caps tag"),
      ("<script SRC=\"x.js\"></script>plain", "plain"),
      ("", ""))
    val out = cases.map(_._1).toDF("h")
      .select(TextAnalysis.htmlExtract(col("h"))).as[String].collect()
    for (((_, want), got) <- cases.zip(out)) assert(got === want)
  }
}
