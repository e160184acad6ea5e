package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.JaroWinklerKernel
import org.apache.spark.unsafe.types.UTF8String

class FuzzyJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("textbook Winkler vectors") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-10)
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    // symmetry
    assert(jw("kitten", "sitting") === jw("sitting", "kitten"))
    // non-BMP code points count as one symbol
    assert(jw("a😀b", "a😀b") === 1.0)
  }

  test("agrees with independently-computed DuckDB values") {
    // constants produced by DuckDB's jaro_winkler_similarity on the same
    // inputs (the oracle gate pins this agreement at corpus scale)
    assert(math.abs(jw("small ring", "small gizmo") - 0.8804545454545455) < 1e-12)
    assert(math.abs(jw("red widget", "red wrench") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("blue bolt", "blue gear") - 0.8222222222222222) < 1e-12)
    assert(math.abs(jw("hot gear", "hot bracket") - 0.8737012987012986) < 1e-12)
    // shared long prefix raises similarity (front-weighting)
    assert(jw("prefix_abc", "prefix_xyz") > jw("abc", "xyz"))
  }

  test("soundex: census textbook vectors; usable as a block key") {
    import graft.functions.SoundexKernel
    def sx(s: String) = SoundexKernel.soundex(UTF8String.fromString(s)).toString
    // the canonical vectors, incl. the h-transparency and collapse rules
    assert(sx("Robert") === "R163" && sx("Rupert") === "R163")
    assert(sx("Ashcraft") === "A261" && sx("Ashcroft") === "A261")
    assert(sx("Tymczak") === "T522")
    assert(sx("Pfister") === "P236")
    assert(sx("Honeyman") === "H555")
    assert(sx("Washington") === "W252")
    assert(sx("lee") === "L000")
    assert(sx("  123 Gutierrez") === "G362") // leading non-letters skipped
    assert(sx("日本") === "")
    // blockKey seat: jaroWinklerPairs accepts the soundex column
    val docs = Seq((1L, "Robert"), (2L, "Rupert"), (3L, "Ashcraft"))
      .toDF("id", "name")
    val viaSoundex = FuzzyJoin.jaroWinklerPairs(docs, "id", "name",
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.Soundex4(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("name")))),
      0.5)
    val pairs = viaSoundex.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L))) // only the R163 block pairs up
  }

  test("sorted-neighborhood == naive rank-window pairs; no dup pairs") {
    val parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val w = 7
    val got = FuzzyJoin.sortedNeighborhoodPairs(parts, "p_partkey", "p_name",
        "p_name", w, 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).sorted
    // naive reference: global sort, all pairs within w positions
    val ranked = parts.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, s) => (s, id) }
    val naive = (for {
      i <- ranked.indices; j <- (i + 1) to math.min(i + w, ranked.length - 1)
      v = jw(ranked(i)._2, ranked(j)._2) if v >= 0.85
      a = math.min(ranked(i)._1, ranked(j)._1)
      b = math.max(ranked(i)._1, ranked(j)._1)
    } yield (a, b, math.rint(v * 1e6) / 1e6)).sorted
    assert(got.toSeq === naive.toSeq && got.nonEmpty)
    assert(got.distinct.length === got.length, "duplicate pairs emitted")
  }

  test("blocked pairs: exact within blocks, deterministic, thresholded") {
    val parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val pairs = FuzzyJoin.jaroWinklerPairs(parts, "p_partkey", "p_name",
      FuzzyJoin.firstTokenKey("p_name"), 0.8)
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    // every emitted pair really satisfies the kernel at >= 0.8 and shares
    // the block key
    rows.foreach { r =>
      val v = jw(r.getString(2), r.getString(3))
      assert(v >= 0.8 && math.abs(math.rint(v * 1e6) / 1e6 - r.getDouble(4)) < 1e-9)
      assert(r.getString(2).split("\\s+")(0).toLowerCase ===
        r.getString(3).split("\\s+")(0).toLowerCase)
      assert(r.getLong(0) < r.getLong(1))
    }
    // constant block key == exact all-pairs baseline
    val all = FuzzyJoin.jaroWinklerPairs(parts.limit(60), "p_partkey",
      "p_name", lit(1), 0.8).count()
    val n = 60
    val brute = parts.limit(60).collect().map(r => (r.getLong(0), r.getString(1)))
    val bruteCount = (for {
      (ia, sa) <- brute; (ib, sb) <- brute if ia < ib && jw(sa, sb) >= 0.8
    } yield 1).size
    assert(all === bruteCount)
  }
}
