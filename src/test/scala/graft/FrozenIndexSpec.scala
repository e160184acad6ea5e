package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The frozen-index path (SparkEntry.freeze / corpusSig) keys its hive
  * partitions by corpus row count AND a content token, so two corpora
  * with EQUAL row counts can never select each other's frames — the
  * same-count collision window VERDICT r11 flagged. Also pins the GC
  * that bounds /tmp/graft_frozen across rounds. */
class FrozenIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def corpus(ids: Seq[Long], shift: Double) = {
    import spark.implicits._
    ids.map(i => (i, Array.tabulate(64)(d => (d + 1) * 0.01 + i * 0.001 + shift)))
      .toDF("vec_id", "embedding")
  }

  test("equal-count corpora with different content get different tokens") {
    val a = corpus(0L until 50L, shift = 0.0)
    val b = corpus(0L until 50L, shift = 1.0) // same ids, same count
    val (na, ta) = SparkEntry.corpusSig(a)
    val (nb, tb) = SparkEntry.corpusSig(b)
    assert(na === nb)
    assert(ta !== tb)
  }

  test("token matches the DuckDB oracle's integer-arithmetic replica") {
    // re-derive the oracle's pmod arithmetic on the driver: if this
    // drifts from corpusSig, the oracle would select zero rows and every
    // frozen gate would hash-mismatch — pin the equivalence here
    // -5L pins the negative-id path: the SQL replica wraps the INNER
    // vec_id mod the same way as Spark's pmod (DuckDB % keeps sign)
    val ids = Seq(0L, 1L, 7L, 123456789L, 2147483650L, -5L)
    val rows = ids.map(i => (i, Array.tabulate(64)(d => -0.7 + d * 0.02 + i * 1e-7)))
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val (_, tok) = SparkEntry.corpusSig(df)
    def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }
    // each floor term pmod-clamped BEFORE the sum (the r13 overflow fix:
    // bounded inner expression at any coordinate magnitude)
    val want = rows.map { case (id, v) =>
      pmod(pmod(id, 2147483648L) * 2654435761L
          + pmod(math.floor(v(0) * 4096).toLong, 1000000000L)
          + pmod(math.floor(v(63) * 4096).toLong, 1000000000L),
        1000000000L)
    }.sum
    assert(tok === want)
  }

  test("pathological coordinate magnitudes stay bounded (no silent Long wrap)") {
    import spark.implicits._
    // pre-clamp, |floor(v·4096)| up to ~4e18 pushed the inner sum past
    // Long.MaxValue once added to the ~5.7e18 id term: Spark wrapped
    // silently while the DuckDB replica raised. The clamp bounds each
    // floor term to [0, 1e9); pin Spark == the local replica on huge,
    // tiny-negative, and mixed coordinates.
    val rows = Seq(
      (3L, Array.tabulate(64)(d => if (d == 0) 9.9e14 else 0.01 * d)),
      (4L, Array.tabulate(64)(d => if (d == 63) -8.7e14 else 0.02 * d)),
      (5L, Array.tabulate(64)(d => 1.0e13 + d)))
    val (_, tok) = SparkEntry.corpusSig(rows.toDF("vec_id", "embedding"))
    def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }
    val want = rows.map { case (id, v) =>
      pmod(pmod(id, 2147483648L) * 2654435761L
          + pmod(math.floor(v(0) * 4096).toLong, 1000000000L)
          + pmod(math.floor(v(63) * 4096).toLong, 1000000000L),
        1000000000L)
    }.sum
    assert(tok === want)
  }

  test("tail-perturbed corpus (same ids, same leading coords) gets a different token") {
    import spark.implicits._
    // the r12 window: two corpora agreeing on ids and FIRST coordinates
    // collided on (n, h); sampling the last coordinate closes it
    val base = (0L until 50L).map(i =>
      (i, Array.tabulate(64)(d => (d + 1) * 0.01 + i * 0.001)))
    val perturbed = base.map { case (i, v) =>
      (i, v.updated(63, v(63) + 1.0))
    }
    val (na, ta) = SparkEntry.corpusSig(base.toDF("vec_id", "embedding"))
    val (nb, tb) = SparkEntry.corpusSig(perturbed.toDF("vec_id", "embedding"))
    assert(na === nb)
    assert(ta !== tb)
  }

  test("freeze partitions coexist per (n, token); reload returns the right frame") {
    import spark.implicits._
    val gate = "spec_frozen_gate"
    // spec-owned gate dir: clear residue from runs under older token
    // formulas (same-day leftovers survive the 24h GC)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"${SparkEntry.frozenRoot}/$gate"))
    val a = corpus(0L until 40L, shift = 0.0)
    val b = corpus(0L until 40L, shift = 2.0)
    val (na, ta) = SparkEntry.corpusSig(a)
    val (nb, tb) = SparkEntry.corpusSig(b)
    val frameA = Seq((0, 1.5), (1, 2.5)).toDF("cent_id", "val")
    val frameB = Seq((0, 9.5), (1, 8.5)).toDF("cent_id", "val")
    SparkEntry.freeze(frameA, gate, "centroids", na, ta).count()
    SparkEntry.freeze(frameB, gate, "centroids", nb, tb).count()
    val root = s"${SparkEntry.frozenRoot}/$gate/centroids"
    // both equal-count partitions coexist under one n=, split by h=
    val hDirs = new java.io.File(s"$root/n=$na").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("h=")).map(_.getName).toSet
    assert(hDirs === Set(s"h=$ta", s"h=$tb"))
    // selecting by (n, h) — the oracle's WHERE — returns exactly the
    // frame frozen FROM that corpus, not the equal-count other
    val gotA = spark.read.option("basePath", root).parquet(root)
      .filter(col("n") === na && col("h") === ta)
      .select("val").as[Double].collect().sorted
    assert(gotA.toSeq === Seq(1.5, 2.5))
    val gotB = spark.read.option("basePath", root).parquet(root)
      .filter(col("n") === nb && col("h") === tb)
      .select("val").as[Double].collect().sorted
    assert(gotB.toSeq === Seq(8.5, 9.5))
  }

  test("freeze GCs partitions older than a day (and the legacy layout), bounding the root") {
    import spark.implicits._
    val gate = "spec_frozen_gc"
    val root = new java.io.File(s"${SparkEntry.frozenRoot}/$gate/centroids")
    // plant a stale token-layout partition and a stale legacy (pre-token)
    // file, both dated two days back
    val old = System.currentTimeMillis() - 2L * 24 * 3600 * 1000
    val staleH = new java.io.File(root, "n=999/h=123")
    assert(staleH.mkdirs())
    val staleFile = new java.io.File(staleH, "part-0.parquet")
    assert(staleFile.createNewFile())
    staleH.setLastModified(old)
    val legacyN = new java.io.File(root, "n=998")
    assert(legacyN.mkdirs())
    val legacyFile = new java.io.File(legacyN, "part-0.parquet")
    assert(legacyFile.createNewFile())
    legacyFile.setLastModified(old)
    // freezing anything under the same gate/part sweeps both
    val c = corpus(0L until 10L, shift = 0.0)
    val (n, tok) = SparkEntry.corpusSig(c)
    SparkEntry.freeze(Seq((1, 1.0)).toDF("cent_id", "val"),
      gate, "centroids", n, tok).count()
    assert(!staleH.exists() && !new java.io.File(root, "n=999").exists())
    assert(!legacyFile.exists() && !legacyN.exists())
    // the fresh frame is intact
    assert(new java.io.File(root, s"n=$n/h=$tok").exists())
  }
}
