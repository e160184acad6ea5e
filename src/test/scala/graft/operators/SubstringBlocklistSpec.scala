package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.AcAutomaton
import org.apache.spark.unsafe.types.UTF8String

class SubstringBlocklistSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def naiveMatches(text: String, patterns: Seq[String]): Seq[String] =
    patterns.filter(text.contains)

  private def naiveCount(text: String, patterns: Seq[String]): Long =
    patterns.map { p =>
      var n = 0L; var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
      n
    }.sum

  test("automaton == naive contains on overlapping/suffix patterns") {
    val pats = Seq("ab", "ba", "aba", "babab", "b", "abc")
    val ac = new AcAutomaton(pats.toArray)
    for (t <- Seq("ababab", "", "xyz", "abc", "bbbbb", "abab", "cabcab")) {
      val got = ac.matchedPatterns(UTF8String.fromString(t))
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got === naiveMatches(t, pats), s"text '$t'")
      assert(ac.anyMatch(UTF8String.fromString(t)) === naiveMatches(t, pats).nonEmpty)
      assert(ac.countOccurrences(UTF8String.fromString(t)) === naiveCount(t, pats))
    }
  }

  test("fuzz: 2000 random texts x 30 random patterns == naive") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(4))).mkString
    val pats = (0 until 30).map(_ => randStr(1 + rnd.nextInt(5))).distinct
    val ac = new AcAutomaton(pats.toArray)
    for (_ <- 0 until 2000) {
      val t = randStr(rnd.nextInt(60))
      val u = UTF8String.fromString(t)
      val got = ac.matchedPatterns(u)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got === naiveMatches(t, pats), s"text '$t'")
      assert(ac.countOccurrences(u) === naiveCount(t, pats), s"count '$t'")
    }
  }

  test("multi-byte UTF-8 patterns match exactly (no byte-boundary false hits)") {
    val pats = Seq("héllo", "hél", "日本語", "本")
    val ac = new AcAutomaton(pats.toArray)
    val t = "say héllo to 日本語 text"
    val got = ac.matchedPatterns(UTF8String.fromString(t))
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    assert(got === Seq("héllo", "hél", "日本語", "本"))
    // a pattern whose bytes are a PREFIX of a multi-byte char must not hit
    val ac2 = new AcAutomaton(Array("欧")) // E6 AC A7
    assert(!ac2.anyMatch(UTF8String.fromString("次"))) // E6 AC A1
  }

  test("duplicate patterns rejected; empty rejected") {
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "b", "a")))
    intercept[IllegalArgumentException](new AcAutomaton(Array.empty[String]))
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "")))
  }

  test("per-JVM automaton cache is bounded (LRU, 64 entries)") {
    // 200 distinct pattern lists; a long-lived executor must not
    // accumulate one automaton per list forever
    (0 until 200).foreach(i => AcAutomaton.forPatterns(Seq(s"cache-probe-$i")))
    val f = AcAutomaton.getClass.getDeclaredFields
      .find(_.getName.contains("cache")).get
    f.setAccessible(true)
    val size = f.get(AcAutomaton).asInstanceOf[java.util.Map[_, _]].size()
    assert(size <= 64, s"cache grew to $size entries")
    // a repeated lookup returns the SAME instance (cache hit, not rebuild)
    val a1 = AcAutomaton.forPatterns(Seq("stable-pattern"))
    val a2 = AcAutomaton.forPatterns(Seq("stable-pattern"))
    assert(a1 eq a2)
  }

  test("operator surface over documents == per-pattern contains plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pats = Seq("batch batch", "slow sort", "join order", "spark window",
      "hash scan", "customer line")
    val viaAc = SubstringBlocklist.matchPairs(docs, "doc_id", "text", pats)
      .orderBy("doc_id", "pattern").collect().map(r => (r.getLong(0), r.getString(1)))
    val viaContains = pats.map(p =>
        docs.where(col("text").contains(p)).select(col("doc_id"), lit(p).as("p")))
      .reduce(_ unionAll _)
      .orderBy("doc_id", "p").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaAc === viaContains && viaAc.nonEmpty)

    // filterClean == annotate(n_matched == 0)
    val cleanA = SubstringBlocklist.filterClean(docs, "text", pats).count()
    val cleanB = SubstringBlocklist.annotate(docs, "text", pats)
      .where(col("n_matched") === 0).count()
    assert(cleanA === cleanB && cleanA < docs.count())

    // occurrence severity is >= distinct matches per doc
    val sev = SubstringBlocklist.withOccurrenceCount(
        SubstringBlocklist.annotate(docs, "text", pats), "text", pats)
      .where(col("n_occurrences") < col("n_matched")).count()
    assert(sev === 0)
  }

  test("whole-stage codegen: the match expression compiles into the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = SubstringBlocklist.annotate(docs, "text", Seq("spark", "batch"))
      .queryExecution.executedPlan
    val hasWsc = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, plan.toString)
  }
}
