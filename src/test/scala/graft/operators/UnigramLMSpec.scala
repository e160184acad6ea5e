package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class UnigramLMSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("rare-token docs score higher surprisal than common-token docs") {
    // 'the' dominates the corpus; 'xylophone' is a hapax
    val docs = (1L to 20L).map(i => (i, "the the the the")) :+
      (21L, "xylophone qwerty zzyzx plugh")
    val out = UnigramLM.surprisal(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(21L) > out(1L) + 1.0,
      s"rare doc ${out(21L)} must clearly exceed common doc ${out(1L)}")
  }

  test("hand-computed two-doc corpus") {
    // corpus tokens: a a a b  -> p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val m = UnigramLM.surprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) === ((3L, math.rint(-math.log(3.0 / 4) / math.log(2) * 10000) / 10000)))
    assert(m(2L) === ((1L, 2.0))) // -log2(1/4) = 2 bits
  }

  test("bigramSurprisal: hand-computed corpus incl. <s> context and empty doc") {
    // bigrams over both docs: (<s>,a) x2, (a,b), (a,c)  [doc1: "a b", doc2: "a c"]
    // contexts: <s> x2, a x2  ->
    //   P(a|<s>) = 2/2 = 1       -> 0 bits
    //   P(b|a)   = 1/2           -> 1 bit
    //   P(c|a)   = 1/2           -> 1 bit
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, " ")).toDF("doc_id", "text")
    val m = UnigramLM.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) === ((2L, 0.5))) // mean(0, 1)
    assert(m(2L) === ((2L, 0.5)))
    assert(m(3L) === ((0L, 0.0)))
  }

  test("bigramSurprisal: scrambled word order scores above natural order") {
    // repeated natural phrase + one doc with the same words shuffled: the
    // unigram model cannot tell them apart, the bigram model must
    val natural = (1L to 8L).map(i => (i, "the quick brown fox jumps"))
    val scrambled = Seq((99L, "fox the jumps brown quick"))
    val df = (natural ++ scrambled).toDF("doc_id", "text")
    val bi = UnigramLM.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(99L) > bi(1L) + 0.5, s"scrambled ${bi(99L)} vs natural ${bi(1L)}")
    val uni = UnigramLM.surprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(99L) - uni(1L)) < 1e-9, "unigram can't tell them apart")
  }

  test("OOV floor: beyond-vocab tokens take count 1; empty docs score 0") {
    val docs = Seq((1L, "common common common"), (2L, "outcast"), (3L, "  "))
      .toDF("doc_id", "text")
    // maxVocab=1 -> vocab = {common}; 'outcast' maps to the OOV floor
    val m = UnigramLM.surprisal(docs, "doc_id", "text", maxVocab = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // total = 4 occurrences; p(common)=3/4, p(outcast floor)=1/4
    assert(m(1L)._2 < m(2L)._2)
    assert(m(2L) === ((1L, 2.0)))
    assert(m(3L) === ((0L, 0.0)))
  }

  test("kneserNeySurprisal matches a single-threaded reference on a small corpus") {
    val rows = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog"),
      (4L, "the cat sat on the mat"),   // exact dup of 1
      (5L, "  "),                       // empty -> zeros
      (6L, "mat"))
    val d = 0.75
    // reference KN: bigram/context/continuation counts over the whole corpus
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val biAll = rows.flatMap { case (_, t) =>
      val w = toks(t)
      if (w.isEmpty) Nil else ("<s>" +: w).sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val bc = biAll.groupBy(identity).map { case (k, v) => k -> v.size }
    val pc = biAll.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1p = bc.keys.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1c = bc.keys.groupBy(_._2).map { case (k, v) => k -> v.size }
    val tt = bc.size.toDouble
    def score(t: String): (Long, Double) = {
      val w = toks(t)
      if (w.isEmpty) (0L, 0.0)
      else {
        val ss = ("<s>" +: w).sliding(2).map { p =>
          val (prev, cur) = (p(0), p(1))
          val pkn = math.max(bc((prev, cur)) - d, 0.0) / pc(prev) +
            d * n1p(prev) / pc(prev) * (n1c(cur) / tt)
          -math.log(pkn) / math.log(2)
        }.toSeq
        (ss.size.toLong, math.rint(ss.sum / ss.size * 1e4) / 1e4)
      }
    }
    val want = rows.map { case (id, t) => id -> score(t) }.toMap
    val got = UnigramLM.kneserNeySurprisal(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    for ((id, (n, s)) <- want) {
      assert(got(id)._1 === n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - s) < 2e-4, s"doc $id: got ${got(id)._2} want $s")
    }
    // identical docs score identically; every KN probability is a proper
    // probability (surprisal > 0 for any doc with bigrams)
    assert(got(1L) === got(4L))
    assert(got(6L)._2 > 0.0)
  }

  test("kneserNeySurprisal: continuation mass separates one-context from many-context words") {
    // 'glue' follows many distinct contexts; 'rare' always follows 'very'.
    // Unsmoothed bigram treats p(rare|very)=p(glue|x) when raw counts tie;
    // KN gives the many-context word higher continuation probability.
    val df = Seq(
      (1L, "x glue y glue z glue w glue"),
      (2L, "very rare very rare very rare very rare"),
      (3L, "q glue")).toDF("doc_id", "text")
    val out = UnigramLM.kneserNeySurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(_ > 0.0))
  }

  test("perplexityBuckets: per-group cutoffs order head <= middle <= tail") {
    import spark.implicits._
    // Self-trained bigram LM: a doc's surprisal is driven by how PREDICTABLE
    // its continuations are, so a fully-unique sequence scores 0 (every
    // bigram has probability 1 in its own context). Build three genuine
    // tiers per lang via a shared head token with continuation frequencies
    // 4 / 3 / 1: -log2(0.4) < -log2(0.3) < -log2(0.1).
    val docs = (for {
      lang <- Seq("en", "de")
      i <- 1 to 10
    } yield {
      val txt =
        if (i <= 4) s"${lang}a ${lang}common"
        else if (i <= 7) s"${lang}a ${lang}mid"
        else s"${lang}a ${lang}u$i"
      (lang.hashCode.toLong * 100 + i, txt, lang)
    }).toDF("doc_id", "text", "lang")
    val out = UnigramLM.perplexityBuckets(docs, "doc_id", "text", "lang")
    assert(out.count() === 20) // every doc bucketed exactly once
    val byLang = out.collect()
      .groupBy(_.getString(1))
      .view.mapValues(_.map(r => (r.getString(3), r.getDouble(2)))).toMap
    for ((lang, rows) <- byLang) {
      val h = rows.filter(_._1 == "head").map(_._2)
      val m = rows.filter(_._1 == "middle").map(_._2)
      val t = rows.filter(_._1 == "tail").map(_._2)
      assert(h.nonEmpty && t.nonEmpty, s"$lang missing extreme buckets")
      if (m.nonEmpty) {
        assert(h.max <= m.min, s"$lang head > middle")
        assert(m.max <= t.min, s"$lang middle > tail")
      } else assert(h.max <= t.min, s"$lang head > tail")
      // ~30% head at lo=0.3 (ties may widen a bucket, never shrink below)
      assert(h.length >= 3, s"$lang head too small: ${h.length}")
    }
  }
}
