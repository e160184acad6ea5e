package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ExtensionsAndSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("custom expressions callable from SQL via SparkSessionExtensions") {
    import spark.implicits._
    Seq(("Hello   World", "a b c d")).toDF("t", "u").createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT graft_fingerprint64(t) AS fp,
        |       graft_fingerprint64('  hello world ') AS fp2,
        |       graft_simhash64(graft_tokens(t)) AS sh,
        |       graft_word_shingles(u, 3) AS grams,
        |       graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       size(graft_minhash_sig(graft_word_shingles(u, 2), 16)) AS mh,
        |       size(graft_lsh_sigs(array(0.1d, -0.2d), 6, 8)) AS lsh
        |FROM v""".stripMargin).head()
    assert(r.getLong(0) === r.getLong(1)) // normalization invariance through SQL
    assert(r.getAs[scala.collection.Seq[String]]("grams") === Seq("a b c", "b c d"))
    assert(r.getDouble(4) === 11.0)
    assert(r.getInt(5) === 16)
    assert(r.getInt(6) === 8)
  }

  test("UDTF generator: LATERAL VIEW graft_shingles yields positioned n-grams") {
    import spark.implicits._
    Seq((1L, "a b c d"), (2L, "x")).toDF("id", "text").createOrReplaceTempView("docs")
    val rows = spark.sql(
      """SELECT id, pos, shingle FROM docs
        |LATERAL VIEW graft_shingles(text, 3) AS pos, shingle
        |ORDER BY id, pos""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq === Seq((1L, 0, "a b c"), (1L, 1, "b c d")))
    // OUTER variant keeps rows that generate nothing
    val outer = spark.sql(
      """SELECT id, shingle FROM docs
        |LATERAL VIEW OUTER graft_shingles(text, 3) AS pos, shingle""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(outer === Set((1L, "a b c"), (1L, "b c d"), (2L, null)))
  }

  test("Aho-Corasick blocklist functions callable from SQL") {
    import spark.implicits._
    Seq((1L, "the slow sort runs a batch batch pass"), (2L, "clean text"))
      .toDF("id", "t").createOrReplaceTempView("bl")
    val rows = spark.sql(
      """SELECT id, graft_substr_matches(t, 'slow sort|batch batch|absent') AS m,
        |       graft_substr_any_match(t, 'slow sort|batch batch|absent') AS any,
        |       graft_substr_occurrences(t, 'a|aa') AS occ
        |FROM bl ORDER BY id""".stripMargin).collect()
    assert(rows(0).getAs[scala.collection.Seq[String]]("m") ===
      Seq("slow sort", "batch batch"))
    assert(rows(0).getBoolean(2) && !rows(1).getBoolean(2))
    assert(rows(1).getAs[scala.collection.Seq[String]]("m").isEmpty)
    // occurrences counts overlaps: "a batch batch pass" has 4 'a's... count
    // directly against the naive scan
    val t0 = "the slow sort runs a batch batch pass"
    assert(rows(0).getLong(3) ===
      t0.count(_ == 'a') + t0.sliding(2).count(_ == "aa"))
    val e = intercept[Exception](
      spark.sql("SELECT graft_substr_matches('x', lower('A'))").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("SQL function rejects wrong arity / non-literal params with clear errors") {
    val e1 = intercept[Exception](spark.sql("SELECT graft_fingerprint64('a','b')").collect())
    assert(e1.getMessage.contains("argument"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_word_shingles('a b c', length('xx'))").collect())
    assert(e2.getMessage.contains("literal"))
  }

  test("CountMinSketch aggregator: estimates >= true counts, tight for heavy hitters") {
    import spark.implicits._
    val words = (1 to 2000).map(_ => "heavy") ++
      (1 to 100).map(i => s"mid$i") ++ (1 to 5000).map(i => s"rare$i")
    val ds = spark.sparkContext.parallelize(words, 8).toDS()
    val agg = new CountMinSketchAgg(depth = 4, width = 2048)
    val sketch: CountMinSketch = ds.select(agg.toColumn).head()
    val est = sketch.estimate("heavy")
    assert(est >= 2000L, s"estimate $est must not undercount")
    assert(est <= 2000L + 50L, s"estimate $est too loose for a heavy hitter")
    assert(sketch.estimate("absent-token") <= 30L)
    assert(sketch.totalAdds === words.size.toLong)
  }

  test("sorted_intersect_size merge-walk matches array_intersect semantics") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Long*) = new GenericArrayData(xs.toArray)
    assert(HashKernels.intersectSizeSorted(arr(), arr(1L, 2L)) === 0)
    assert(HashKernels.intersectSizeSorted(arr(1L, 3L, 5L), arr(2L, 4L, 6L)) === 0)
    assert(HashKernels.intersectSizeSorted(arr(1L, 3L, 5L), arr(3L, 5L, 9L)) === 2)
    assert(HashKernels.intersectSizeSorted(
      arr(Long.MinValue, -1L, 0L, Long.MaxValue),
      arr(Long.MinValue, 0L, 1L, Long.MaxValue)) === 3)
    // plan-level: agrees with size(array_intersect(...)) on random sorted sets
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      (Seq.fill(30)(rnd.nextInt(40).toLong).distinct.sorted,
       Seq.fill(30)(rnd.nextInt(40).toLong).distinct.sorted))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        expressions.sorted_intersect_size(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("k") =!= col("ref")).count()
    assert(bad === 0)
  }

  test("seqfile writer options: blockSize controls block count; metadata lands in the header") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wropt").toString
    (0 until 20000).map(i => (i.toLong, s"value-$i-padpadpad")).toDF("key", "value")
      .coalesce(1)
      .write.format("seqfile").mode("overwrite")
      .option("blockSize", "8192")
      .option("metadata.origin", "graft-test")
      .option("metadata.version", "1")
      .save(dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".seq")).head
    val header = graft.core.seqfile.SeqFile.readHeader(part.toString)
    assert(header.metadata.toMap === Map("origin" -> "graft-test", "version" -> "1"))
    val rd = graft.core.seqfile.SeqFile.open(part.toString,
      decodeKey = false, decodeValue = false)
    val blocks = try rd.size finally rd.close()
    assert(blocks > 10, s"8KiB blockSize should force many blocks, got $blocks")
    // still readable through the connector and by Hadoop
    assert(spark.read.format("seqfile").load(dir).count() === 20000L)
  }

  test("HLL approx distinct over real shingles stays within the configured rsd") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val row = docs
      .select(explode(graft.functions.TextAnalysis.wordShingles(col("text"), 3)).as("sh"))
      .agg(countDistinct(col("sh")).as("exact"),
        approx_count_distinct(col("sh"), 0.02).as("approx"))
      .head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(exact > 1000L, s"shingle cardinality too low to test HLL: $exact")
    val relErr = math.abs(approx - exact).toDouble / exact
    // rsd 0.02 -> 3 sigma = 0.06; generous but catches a broken sketch
    assert(relErr < 0.06, s"HLL rel err $relErr (exact=$exact approx=$approx)")
  }
}
