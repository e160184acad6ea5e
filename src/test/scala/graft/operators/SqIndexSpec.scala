package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SQ8 scalar-quantized index: per-dimension linear byte quantizer
  * expressed as a PqIndex with dim one-element subspaces — the codebook
  * SHAPE is pinned here (linear values, dense codewords), the encode is
  * checked against an independent closed-form nearest-level computation,
  * and the serve/lifecycle paths are pinned equal to the shared PqIndex
  * machinery they reuse. */
class SqIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val queries = emb.filter(col("vec_id") < 10)
  lazy val dim = emb.select(size(col("embedding"))).head().getInt(0)

  private lazy val vecs: Map[Long, Array[Double]] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private lazy val mnmx: Array[(Double, Double)] = {
    val vs = vecs.values.toArray
    Array.tabulate(dim)(j => (vs.map(_(j)).min, vs.map(_(j)).max))
  }

  test("sqCodebooksDf: dim subspaces x 256 dense codewords, exactly linear in w") {
    val cb = SimilaritySearch.sqCodebooksDf(emb, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getSeq[Double](2).toArray)).toMap
    assert(cb.size === dim * 256)
    assert(cb.keys.map(_._1).toSet === (0 until dim).toSet)
    assert(cb.keys.filter(_._1 == 0).map(_._2).toSet === (0 until 256).toSet)
    for (j <- 0 until dim; w <- Seq(0, 1, 127, 255)) {
      val (mn, mx) = mnmx(j)
      val step = (mx - mn) / 255.0
      val got = cb((j, w))
      assert(got.length === 1)
      // the exact double-arithmetic sequence the oracle SQL replays
      assert(got(0) === mn + w.toDouble * step,
        s"codeword ($j,$w): ${got(0)} != ${mn + w * step}")
    }
    // endpoints decode to the exact range bounds
    for (j <- 0 until dim) {
      assert(cb((j, 0))(0) === mnmx(j)._1)
    }
  }

  test("SQ8 encode equals the independent closed-form nearest level") {
    val idx = SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding")
    val codes = idx.codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes.size === vecs.size)
    for ((id, v) <- vecs.take(25)) {
      val code = codes(id)
      assert(code.length === dim)
      for (j <- 0 until dim) {
        val (mn, mx) = mnmx(j)
        val step = (mx - mn) / 255.0
        // independent argmin over the 256 linear levels (strict <:
        // ties -> lowest codeword, the encodeOne contract)
        var best = 0; var bestD = Double.MaxValue
        for (w <- 0 until 256) {
          val d = { val diff = v(j) - (mn + w * step); diff * diff }
          if (d < bestD) { bestD = d; best = w }
        }
        assert((code(j) & 0xFF) === best, s"id $id dim $j")
      }
    }
  }

  test("SQ8 reconstruction error is bounded by half a step per dimension") {
    val idx = SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding")
    val codes = idx.codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, v) <- vecs.take(25); j <- 0 until dim) {
      val (mn, mx) = mnmx(j)
      val step = (mx - mn) / 255.0
      val recon = mn + (codes(id)(j) & 0xFF).toDouble * step
      assert(math.abs(recon - v(j)) <= step / 2 + 1e-12,
        s"id $id dim $j: |$recon - ${v(j)}| > ${step / 2}")
    }
  }

  test("searchPqIndex over buildSqIndex: save/load round trip serves identically") {
    val dir = java.nio.file.Files.createTempDirectory("sq8-idx").toString
    val built = SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding")
    built.save(dir)
    val loaded = PqIndex.load(spark, dir)
    def serve(ix: PqIndex) =
      SimilaritySearch.searchPqIndex(ix, emb, queries, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    val a = serve(built); val b = serve(loaded)
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("SQ8 recall@10 vs brute force is near-exact (256 levels/dim + exact re-rank)") {
    val idx = SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding")
    val sq = SimilaritySearch.searchPqIndex(idx, emb, queries,
        "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilaritySearch.bruteForceTopK(emb, queries,
        "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(sq.contains).toDouble / brute.size
    // scalar quantization at 256 levels/dim barely perturbs cosines; the
    // ADC ranking then feeds an exact re-rank of 4k candidates — recall
    // should sit far above the PQ (m=8) operating point
    assert(recall >= 0.9, s"sq8 recall $recall")
  }

  test("SQ8 incremental ingest: append against frozen ranges == whole-corpus index serve") {
    val dir = java.nio.file.Files.createTempDirectory("sq8-inc").toString
    val standing = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    SimilaritySearch.buildSqIndex(standing, "vec_id", "embedding").save(dir)
    PqIndex.append(spark, dir, batch, "vec_id", "embedding", batchId = 1L)
    val appended = PqIndex.load(spark, dir)
    assert(appended.codes.count() === emb.count())
    // from-scratch encode of the FULL corpus under the same frozen
    // ranges (the standing corpus's codebooks)
    val scratch = PqIndex(appended.codebooks,
      SimilaritySearch.encodePq(appended.codebooks, emb, "vec_id", "embedding"))
    def serve(ix: PqIndex) =
      SimilaritySearch.searchPqIndex(ix, emb, queries, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    assert(serve(appended) === serve(scratch))
  }

  test("SQ8 tombstone delete: masked serve == index whose codes were never written") {
    val dir = java.nio.file.Files.createTempDirectory("sq8-del").toString
    SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding").save(dir)
    val victims = emb.filter(pmod(col("vec_id"), lit(2)) === 1
      && col("vec_id") >= 10)
    PqIndex.delete(dir, victims, "vec_id", batchId = 1L)
    val masked = PqIndex.load(spark, dir)
    val survivors = emb.join(victims.select(col("vec_id")), Seq("vec_id"),
      "left_anti")
    val never = SimilaritySearch.buildSqIndex(survivors, "vec_id", "embedding")
    // quantizer trained on the FULL corpus for the masked index — rebuild
    // `never` under the same codebooks to isolate the masking semantics
    val neverSameCb = PqIndex(masked.codebooks,
      SimilaritySearch.encodePq(masked.codebooks, survivors, "vec_id", "embedding"))
    def serve(ix: PqIndex, corpus: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.searchPqIndex(ix, corpus, queries, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    val m = serve(masked, emb)
    assert(m === serve(neverSameCb, survivors))
    // no tombstoned id can ever be returned
    val deadIds = victims.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!m.exists(r => deadIds.contains(r._2)))
    assert(never.codes.count() === survivors.count())
  }

  test("IVF-SQ8: scalar codebooks through the IVF lifecycle — the fourth matrix cell") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-idx").toString
    val built = SimilaritySearch.buildIvfSqIndex(emb, "vec_id", "embedding",
      numCentroids = 8)
    built.save(dir)
    val loaded = IvfPqIndex.load(spark, dir)
    // the codebooks half IS the flat SQ8 quantizer — same min/max frame
    def cbMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("subspace").cast("int"), col("codeword").cast("int"),
          col("vec").cast("array<double>"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)),
          r.getSeq[Double](2).head)).toMap
    assert(cbMap(loaded.codebooks) ===
      cbMap(SimilaritySearch.sqCodebooksDf(emb, "vec_id", "embedding")))
    // built codes == a from-scratch assign+encode under the loaded
    // quantizer pair (same fused kernel — parquet round-trips exactly)
    val scratch = SimilaritySearch.encodeIvfPq(loaded.centroids,
        loaded.codebooks, emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    val got = loaded.codes
      .select(col("id").cast("long"), col("list_id").cast("long"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(got === scratch)
    // save/load round trip serves identically, probe-bounded
    def serve(ix: IvfPqIndex) =
      SimilaritySearch.searchIvfPqIndex(ix, emb, queries,
          "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    val a = serve(built); val b = serve(loaded)
    assert(a === b)
    assert(a.nonEmpty)
    // probing bounds recall (nProbe = C/4 lists of 8); SQ8 codes are
    // near-lossless, so within the probed lists ranking is essentially
    // exact — assert the same floor the IVF teaching tier carries
    val brute = SimilaritySearch.bruteForceTopK(emb, queries,
        "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = a.map(r => (r._1, r._2))
    val recall = brute.count(gotPairs.contains).toDouble / brute.size
    assert(recall >= 0.3, s"ivf-sq8 recall $recall")
  }

  test("IVF-SQ8 incremental ingest rides the shared IvfPqIndex append: batch == from-scratch") {
    val dir = java.nio.file.Files.createTempDirectory("ivfsq-inc").toString
    val standing = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    SimilaritySearch.buildIvfSqIndex(standing, "vec_id", "embedding",
      numCentroids = 8).save(dir)
    IvfPqIndex.append(spark, dir, batch, "vec_id", "embedding", batchId = 1L)
    val appended = IvfPqIndex.load(spark, dir)
    assert(appended.codes.count() === emb.count())
    // appended codes == a from-scratch fused assign+encode of the FULL
    // corpus under the standing quantizer pair (kmeans half + the
    // evens-trained SQ ranges — both frozen at build)
    val scratch = SimilaritySearch.encodeIvfPq(appended.centroids,
        appended.codebooks, emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    val got = appended.codes
      .select(col("id").cast("long"), col("list_id").cast("long"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(got === scratch)
  }

  test("degenerate dimension (min == max): codebook constant, encode 0, serve NaN-free") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      (i, Array(1.5f, (i % 7).toFloat, -2.0f + i * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cb = SimilaritySearch.sqCodebooksDf(df, "vec_id", "embedding")
      .filter(col("subspace") === 0).collect()
      .map(r => r.getSeq[Double](1 + 1).head)
    assert(cb.toSet === Set(1.5))
    val idx = SimilaritySearch.buildSqIndex(df, "vec_id", "embedding")
    val codes = idx.codes.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes.values.forall(c => (c(0) & 0xFF) === 0))
    val served = SimilaritySearch.searchPqIndex(idx, df,
        df.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .collect()
    assert(served.nonEmpty)
    assert(served.forall(r => !r.getDouble(3).isNaN))
  }
}
