package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The pure-SQL seat: every statement below goes through `spark.sql` only —
  * no Scala operator call in the pipeline under test. Each TVF must return
  * exactly what the same-named Scala API returns (single code path). */
class GraftSqlTableFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val docs = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.createOrReplaceTempView("docs")
    d
  }

  test("SQL-only flagship chain: minhash pairs -> components -> keep-best") {
    docs // register the view
    // 1. near-dup candidate pairs (MinHash-LSH, exact-Jaccard verified)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW pairs AS
        |SELECT * FROM graft_minhash_pairs('docs', 'doc_id', 'text', 3, 0.8)""".stripMargin)
    // 2. duplicate clusters (connected components)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW comps AS
        |SELECT * FROM graft_components('pairs', 'id_a', 'id_b')""".stripMargin)
    // 3. keep-best: plain SQL picks one representative per cluster
    //    (longest text, ties to lowest id) and keeps all unclustered docs
    val survivors = spark.sql(
      """SELECT d.doc_id FROM docs d
        |LEFT JOIN comps c ON d.doc_id = c.id
        |LEFT JOIN (
        |  SELECT c.comp, max_by(d.doc_id, struct(length(d.text), -d.doc_id)) AS rep
        |  FROM comps c JOIN docs d ON c.id = d.doc_id
        |  GROUP BY c.comp) r ON c.comp = r.comp
        |WHERE c.id IS NULL OR d.doc_id = r.rep
        |ORDER BY d.doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq

    // the same chain through the Scala API must agree exactly
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.8)
    val comps = graft.operators.ConnectedComponents.components(pairs, "id_a", "id_b")
    val reps = comps.alias("c")
      .join(docs.alias("d"), col("c.id") === col("d.doc_id"))
      .groupBy(col("c.comp"))
      .agg(expr("max_by(d.doc_id, struct(length(d.text), -d.doc_id))").as("rep"))
    val want = docs.alias("d")
      .join(comps.alias("c"), col("d.doc_id") === col("c.id"), "left")
      .join(reps.alias("r"), col("c.comp") === col("r.comp"), "left")
      .filter(col("c.id").isNull || col("d.doc_id") === col("r.rep"))
      .select(col("d.doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq

    assert(survivors === want)
    assert(survivors.nonEmpty && survivors.size < docs.count())
  }

  test("graft_dedup_exact and graft_dedup_keepbest from SQL match the Scala API") {
    docs
    val sqlExact = spark.sql(
      "SELECT * FROM graft_dedup_exact('docs', 'doc_id', 'text') ORDER BY doc_id")
      .collect().map(_.toString).toSeq
    val apiExact = graft.operators.Dedup.exactDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(sqlExact === apiExact && sqlExact.nonEmpty)

    val sqlBest = spark.sql(
      "SELECT * FROM graft_dedup_keepbest('docs', 'doc_id', 'text', 'length(text)') ORDER BY doc_id")
      .collect().map(_.toString).toSeq
    val apiBest = graft.operators.Dedup.exactDedupKeepBest(docs, "doc_id", "text",
        length(col("text")))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(sqlBest === apiBest && sqlBest.nonEmpty)
  }

  test("graft_chunk_tokens and graft_bm25 from SQL match the Scala API") {
    docs
    val sqlChunks = spark.sql(
      """SELECT * FROM graft_chunk_tokens('docs', 'doc_id', 'text', 64, 48)
        |ORDER BY doc_id, chunk_idx""".stripMargin)
      .collect().map(_.toString).toSeq
    val apiChunks = graft.operators.Chunking.tokenChunks(docs, "doc_id", "text", 64, 48)
      .orderBy("doc_id", "chunk_idx").collect().map(_.toString).toSeq
    assert(sqlChunks === apiChunks && sqlChunks.nonEmpty)

    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW qs AS
        |SELECT 1L AS q_id, 'data pipeline quality' AS q_text""".stripMargin)
    val sqlBm = spark.sql(
      """SELECT * FROM graft_bm25('docs', 'doc_id', 'text', 'qs', 'q_id', 'q_text', 5)
        |ORDER BY q_id, rank""".stripMargin)
      .collect().map(_.toString).toSeq
    val apiBm = graft.operators.TextRanking.bm25TopK(docs, "doc_id", "text",
        spark.table("qs"), "q_id", "q_text", 5)
      .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    assert(sqlBm === apiBm && sqlBm.nonEmpty)
  }

  test("graft_ann_pq serves a persisted PQ index from SQL") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW emb_q AS SELECT * FROM emb WHERE vec_id < 3")
    val dir = java.nio.file.Files.createTempDirectory("sql-pq-idx-").toString
    graft.operators.SimilaritySearch
      .buildPqIndex(emb, "vec_id", "embedding").save(dir)
    val sqlAnn = spark.sql(
      s"""SELECT * FROM graft_ann_pq('$dir', 'emb', 'emb_q', 'vec_id', 'embedding', 5)
         |ORDER BY q_id, rank""".stripMargin)
      .collect().map(_.toString).toSeq
    val apiAnn = graft.operators.SimilaritySearch.searchPqIndex(
        graft.operators.PqIndex.load(spark, dir),
        emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5)
      .orderBy("q_id", "rank").collect().map(_.toString).toSeq
    assert(sqlAnn === apiAnn && sqlAnn.nonEmpty)
  }

  test("graft_phrase_search and graft_dsir from SQL match the Scala API") {
    docs
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW qs AS
        |SELECT * FROM VALUES (1, 'table hash'), (2, 'the the')
        |AS t(q_id, phrase)""".stripMargin)
    val sqlPs = spark.sql(
      """SELECT * FROM graft_phrase_search('docs', 'doc_id', 'text',
        |                                  'qs', 'q_id', 'phrase')
        |ORDER BY q_id, doc_id""".stripMargin)
      .collect().map(_.toString).toSeq
    val qsDf = spark.table("qs")
    val apiPs = graft.operators.TextRanking
      .phraseSearch(docs, "doc_id", "text", qsDf, "q_id", "phrase")
      .orderBy("q_id", "doc_id").collect().map(_.toString).toSeq
    assert(sqlPs === apiPs && sqlPs.nonEmpty)

    val sqlDsir = spark.sql(
      """SELECT * FROM graft_dsir('docs', 'doc_id', 'text',
        |                         'source IN (''src0'', ''src1'')', 20)
        |ORDER BY doc_id""".stripMargin)
      .collect().map(_.toString).toSeq
    val apiDsir = graft.operators.ImportanceSampling
      .dsirResample(docs, "doc_id", "text",
        col("source").isin("src0", "src1"), n = 20)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(sqlDsir === apiDsir && sqlDsir.nonEmpty)
    assert(sqlDsir.count(_.endsWith(",1]")) === 20)
  }

  test("graft_repetition_fracs scalar matches the TextAnalysis columns") {
    docs
    val viaSql = spark.sql(
      """SELECT doc_id, round(graft_repetition_fracs(text, 2)[0], 6) AS t,
        |       round(graft_repetition_fracs(text, 2)[1], 6) AS d
        |FROM docs ORDER BY doc_id LIMIT 20""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val viaApi = docs.select(col("doc_id"),
        round(TextAnalysis.topNgramCharFrac(col("text"), 2), 6).as("t"),
        round(TextAnalysis.dupNgramCharFrac(col("text"), 2), 6).as("d"))
      .orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("round-8 corpus-stat TVFs match their Scala twins byte for byte") {
    docs
    val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      ("SELECT * FROM graft_winnow_pairs('docs','doc_id','text',5,4,0.2,64) ORDER BY id_a, id_b",
        graft.operators.Winnowing.overlapPairs(docs, "doc_id", "text", 5, 4, 0.2, 64)
          .orderBy("id_a", "id_b")),
      ("SELECT * FROM graft_script_profile('docs','doc_id','text') ORDER BY id",
        graft.operators.CorpusStats.scriptProfile(docs, "doc_id", "text").orderBy("id")),
      ("SELECT * FROM graft_vocab_stats('docs','source','text',10,1000) ORDER BY slice",
        graft.operators.CorpusStats.vocabStats(docs, "source", "text", 10, 1000)
          .orderBy("slice")),
      ("SELECT * FROM graft_oov_rate('docs','doc_id','text',16) ORDER BY id",
        graft.operators.CorpusStats.oovRate(docs, "doc_id", "text", 16).orderBy("id")),
      ("SELECT * FROM graft_novelty('docs','doc_id','text',3) ORDER BY id",
        graft.operators.Dedup.noveltyScores(docs, "doc_id", "text", 3).orderBy("id")))
    for ((sql, api) <- cases) {
      val viaSql = spark.sql(sql).collect().map(_.toString).toSeq
      val viaApi = api.collect().map(_.toString).toSeq
      assert(viaSql === viaApi && viaSql.nonEmpty, sql)
    }
    // default-arity variants resolve too
    assert(spark.sql("SELECT * FROM graft_winnow_pairs('docs','doc_id','text')")
      .columns.toSeq === Seq("id_a", "id_b", "shared", "overlap"))
    assert(spark.sql("SELECT * FROM graft_vocab_stats('docs','source','text')")
      .columns.contains("zipf_slope"))
  }

  test("curation TVFs (mixture/budget/ccnet/cluster) match their Scala twins") {
    docs
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sized AS
        |SELECT doc_id, source,
        |  CAST(size(graft_tokens(text)) AS BIGINT) AS toks,
        |  length(text) AS quality
        |FROM docs""".stripMargin)
    val sized = spark.table("sized")
    val cases = Seq(
      ("SELECT * FROM graft_mixture_weights('sized','source','toks',0.3) ORDER BY source",
        graft.operators.Sampling.temperatureWeights(sized, "source", "toks", 0.3)
          .orderBy("source")),
      ("SELECT * FROM graft_token_budget('sized','doc_id','quality','toks',5000) ORDER BY doc_id",
        graft.operators.Sampling.tokenBudgetSelect(sized, "doc_id", "quality", "toks", 5000L)
          .orderBy("doc_id")),
      ("SELECT * FROM graft_ccnet_buckets('docs','doc_id','text','lang') ORDER BY doc_id",
        graft.operators.UnigramLM.perplexityBuckets(docs, "doc_id", "text", "lang")
          .orderBy("doc_id")),
      ("SELECT * FROM graft_cluster_profile('emb','vec_id','embedding','label',4) ORDER BY cent_id",
        graft.operators.SimilaritySearch.clusterProfile(
          spark.table("emb"), "vec_id", "embedding", "label", 4)
          .orderBy("cent_id")))
    for ((sql, api) <- cases) {
      val viaSql = spark.sql(sql).collect().map(_.toString).toSeq
      val viaApi = api.collect().map(_.toString).toSeq
      assert(viaSql === viaApi && viaSql.nonEmpty, sql)
    }
    // graft_triangles / graft_funnel: same rows as the Scala API
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_partkey AS a", "l_suppkey AS b")
      .createOrReplaceTempView("tri_edges")
    val triSql = spark.sql(
      "SELECT * FROM graft_triangles('tri_edges', 'a', 'b') ORDER BY node")
      .collect().map(_.toString).toSeq
    val triApi = graft.operators.Triangles.perNode(spark.table("tri_edges"),
        "a", "b").orderBy(col("node"))
      .collect().map(_.toString).toSeq
    assert(triSql === triApi && triSql.nonEmpty)

    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .createOrReplaceTempView("fn_events")
    val fnSql = spark.sql(
      "SELECT * FROM graft_funnel('fn_events', 'user_id', 'event_type', 'ts', 'view,click,purchase')")
      .collect().map(_.toString).toSeq
    val fnApi = graft.operators.Funnel.conversion(spark.table("fn_events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(_.toString).toSeq
    assert(fnSql === fnApi && fnSql.size === 3)

    // graft_collocations / graft_fuzzy_pairs / graft_fuzzy_neighborhood
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("co_docs")
    val coSql = spark.sql(
      "SELECT * FROM graft_collocations('co_docs', 'text', 5, 10)")
      .collect().map(_.toString).toSeq
    val coApi = graft.operators.Collocations.pmiTopK(
        spark.table("co_docs"), "text", 5, 10)
      .collect().map(_.toString).toSeq
    assert(coSql === coApi && coSql.size === 10)

    spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .createOrReplaceTempView("fz_part")
    val fzSql = spark.sql(
      "SELECT * FROM graft_fuzzy_pairs('fz_part', 'p_partkey', 'p_name', 0.9) ORDER BY id_a, id_b")
      .collect().map(_.toString).toSeq
    val fzApi = graft.operators.FuzzyJoin.jaroWinklerPairs(
        spark.table("fz_part"), "p_partkey", "p_name",
        graft.operators.FuzzyJoin.firstTokenKey("p_name"), 0.9)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(_.toString).toSeq
    assert(fzSql === fzApi && fzSql.nonEmpty)

    val snSql = spark.sql(
      "SELECT * FROM graft_fuzzy_neighborhood('fz_part', 'p_partkey', 'p_name', 10, 0.9) ORDER BY id_a, id_b")
      .collect().map(_.toString).toSeq
    val snApi = graft.operators.FuzzyJoin.sortedNeighborhoodPairs(
        spark.table("fz_part"), "p_partkey", "p_name", "p_name", 10, 0.9)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(_.toString).toSeq
    assert(snSql === snApi && snSql.nonEmpty)

    // graft_retention: same cohort table as the Scala API
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .createOrReplaceTempView("rt_events")
    val rtSql = spark.sql(
      "SELECT * FROM graft_retention('rt_events', 'user_id', 'ts', 86400000000, 5) ORDER BY cohort, offset")
      .collect().map(_.toString).toSeq
    val rtApi = graft.operators.Retention.cohortRetention(
        spark.table("rt_events"), "user_id",
        floor(unix_micros(col("ts")) / lit(86400000000L)), 5)
      .orderBy(col("cohort"), col("offset"))
      .collect().map(_.toString).toSeq
    assert(rtSql === rtApi && rtSql.nonEmpty)

    // graft_pagerank: same ranks as the Scala API
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .selectExpr("l_partkey AS s", "l_suppkey AS d")
      .createOrReplaceTempView("pr_edges")
    val prSql = spark.sql(
      "SELECT node, round(rank, 9) AS r FROM graft_pagerank('pr_edges', 's', 'd', '', 4) ORDER BY node")
      .collect().map(_.toString).toSeq
    val prApi = graft.operators.PageRank.run(spark.table("pr_edges"),
        "s", "d", None, iters = 4)
      .select(col("node"), round(col("rank"), 9).as("r")).orderBy(col("node"))
      .collect().map(_.toString).toSeq
    assert(prSql === prApi && prSql.nonEmpty)

    // graft_zorder: same rows + same zv values as the Scala rewrite
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li")
    val zSql = spark.sql(
      "SELECT zv, l_orderkey, l_linenumber FROM graft_zorder('li', 'l_partkey,l_suppkey', 16, 8) ORDER BY zv, l_orderkey, l_linenumber")
      .collect().map(_.toString).toSeq
    val zApi = graft.operators.ZOrder.zorderBy(spark.table("li"),
        Seq("l_partkey", "l_suppkey"), 16, 8)
      .select(col("zv"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("zv"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(_.toString).toSeq
    assert(zSql === zApi && zSql.nonEmpty)
  }

  test("literal-argument validation fails loudly, not silently") {
    docs
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft_minhash_pairs('docs', 'doc_id', 'text', 'not_int', 0.8)").collect())
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("n must be"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_dedup_exact('docs', 'doc_id')").collect())
    assert(e2.getMessage.contains("expects") || e2.getMessage.contains("arguments"))
  }
}
