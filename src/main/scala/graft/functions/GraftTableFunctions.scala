package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}

import graft.operators.{Chunking, ConnectedComponents, CorpusStats, Dedup, ImportanceSampling, PqIndex, Sampling, SimilaritySearch, TextRanking, UnigramLM, Winnowing}

/** SQL-invocable TABLE functions for the operator suite — the pure-SQL seat
  * (a JDBC/SQL-client user who never touches the Scala API) can run the
  * flagship pipeline chain end to end:
  *
  * {{{
  * -- near-dup pairs over a view/table, clusters, then plain-SQL keep-best:
  * CREATE OR REPLACE TEMPORARY VIEW pairs AS
  *   SELECT * FROM graft_minhash_pairs('docs', 'doc_id', 'text', 3, 0.8);
  * CREATE OR REPLACE TEMPORARY VIEW comps AS
  *   SELECT * FROM graft_components('pairs', 'id_a', 'id_b');
  * SELECT * FROM graft_dedup_exact('docs', 'doc_id', 'text');
  * SELECT * FROM graft_dedup_keepbest('docs', 'doc_id', 'text', 'length(text)');
  * SELECT * FROM graft_chunk_tokens('docs', 'doc_id', 'text', 128, 96);
  * SELECT * FROM graft_bm25('docs', 'doc_id', 'text', 'qs', 'q_id', 'q_text', 10);
  * SELECT * FROM graft_ann_pq('/indexes/pq', 'emb', 'queries', 'vec_id', 'embedding', 10);
  * SELECT * FROM graft_phrase_search('docs', 'doc_id', 'text', 'qs', 'q_id', 'phrase');
  * SELECT * FROM graft_dsir('docs', 'doc_id', 'text', 'source = ''wiki''', 1000);
  * }}}
  *
  * Arguments are LITERALS (table/view names, column names, knobs) — a table
  * function builder runs at analysis time, so the referenced relations must
  * already exist in the catalog (temp views work). Each function returns
  * exactly the DataFrame the same-named Scala operator returns; there is
  * one code path, not a SQL re-implementation.
  */
object GraftTableFunctions {

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** SQL `0.8` parses as a decimal literal; accept decimal/double/int. */
  private def doubleLit(e: Expression, what: String): Double = e match {
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
    case Literal(v: Double, DoubleType) => v
    case Literal(v: Int, IntegerType) => v.toDouble
    case Literal(v: Long, LongType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def table(name: String): DataFrame = SparkSession.active.table(name)

  def registerAll(ext: SparkSessionExtensions): Unit = {
    def registerTable(name: String, arity: Seq[Int],
                      builder: Seq[Expression] => LogicalPlan): Unit =
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          if (!arity.contains(args.length))
            throw new IllegalArgumentException(
              s"$name expects ${arity.mkString("/")} arguments, got ${args.length}")
          builder(args)
        }))

    def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

    // exact dedup: one surviving row per distinct fingerprint
    registerTable("graft_dedup_exact", Seq(3), args =>
      plan(Dedup.exactDedup(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"))))

    // exact dedup keeping the best row per group; 4th arg is a SQL
    // expression evaluated over the input row (higher = preferred)
    registerTable("graft_dedup_keepbest", Seq(4), args =>
      plan(Dedup.exactDedupKeepBest(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        expr(strLit(args(3), "preferExpr")))))

    // MinHash-LSH near-dup candidate pairs, verified by exact Jaccard
    registerTable("graft_minhash_pairs", Seq(5), args =>
      plan(Dedup.minHashLshPairs(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        intLit(args(3), "n"), doubleLit(args(4), "threshold"))))

    // connected components over a pair table -> (id, comp)
    registerTable("graft_components", Seq(3), args =>
      plan(ConnectedComponents.components(table(strLit(args(0), "pairsTable")),
        strLit(args(1), "aCol"), strLit(args(2), "bCol"))))

    // token-window chunking -> (id, chunk_id, chunk_text, n_tokens)
    registerTable("graft_chunk_tokens", Seq(5), args =>
      plan(Chunking.tokenChunks(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        intLit(args(3), "chunkSize"), intLit(args(4), "stride"))))

    // BM25 top-k documents per query
    registerTable("graft_bm25", Seq(7), args =>
      plan(TextRanking.bm25TopK(table(strLit(args(0), "docsTable")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        table(strLit(args(3), "queriesTable")),
        strLit(args(4), "qIdCol"), strLit(args(5), "qTextCol"),
        intLit(args(6), "k"))))

    // ANN over a PERSISTED PQ index (built/saved via the Scala API or a
    // previous job): index dir, corpus for exact re-rank, query table
    registerTable("graft_ann_pq", Seq(6), args => {
      val spark = SparkSession.active
      plan(SimilaritySearch.searchPqIndex(
        PqIndex.load(spark, strLit(args(0), "indexDir")),
        table(strLit(args(1), "corpusTable")),
        table(strLit(args(2), "queriesTable")),
        strLit(args(3), "idCol"), strLit(args(4), "vecCol"),
        intLit(args(5), "k")))
    })

    // exact phrase search -> (q_id, doc_id, n_matches, first_pos)
    registerTable("graft_phrase_search", Seq(6), args =>
      plan(TextRanking.phraseSearch(table(strLit(args(0), "docsTable")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        table(strLit(args(3), "phrasesTable")),
        strLit(args(4), "qIdCol"), strLit(args(5), "phraseCol"))))

    // DSIR selection -> (doc_id, log_weight, selected); 4th arg is a SQL
    // predicate over the input row marking the target slice
    registerTable("graft_dsir", Seq(5), args =>
      plan(ImportanceSampling.dsirResample(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        expr(strLit(args(3), "targetPredicate")), intLit(args(4), "n"))))

    // winnowing (MOSS) fingerprint overlap pairs
    // -> (id_a, id_b, shared, overlap)
    registerTable("graft_winnow_pairs", Seq(3, 7), args =>
      plan(if (args.length == 3)
        Winnowing.overlapPairs(table(strLit(args(0), "table")),
          strLit(args(1), "idCol"), strLit(args(2), "textCol"))
      else
        Winnowing.overlapPairs(table(strLit(args(0), "table")),
          strLit(args(1), "idCol"), strLit(args(2), "textCol"),
          intLit(args(3), "k"), intLit(args(4), "w"),
          doubleLit(args(5), "threshold"), intLit(args(6), "maxDf"))))

    // unicode-script composition per document -> fractions + dominant
    registerTable("graft_script_profile", Seq(3), args =>
      plan(CorpusStats.scriptProfile(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"))))

    // per-slice vocabulary panel -> TTR / hapax / head coverage / Zipf
    registerTable("graft_vocab_stats", Seq(3, 5), args =>
      plan(if (args.length == 3)
        CorpusStats.vocabStats(table(strLit(args(0), "table")),
          strLit(args(1), "sliceCol"), strLit(args(2), "textCol"))
      else
        CorpusStats.vocabStats(table(strLit(args(0), "table")),
          strLit(args(1), "sliceCol"), strLit(args(2), "textCol"),
          intLit(args(3), "topN"), intLit(args(4), "slopeN"))))

    // per-doc OOV rate vs the corpus top-V token vocabulary
    registerTable("graft_oov_rate", Seq(4), args =>
      plan(CorpusStats.oovRate(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        intLit(args(3), "vocabSize"))))

    // incremental n-gram novelty -> (id, n_shingles, n_novel, novelty)
    registerTable("graft_novelty", Seq(4), args =>
      plan(Dedup.noveltyScores(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "textCol"),
        intLit(args(3), "n"))))

    // temperature-scaled source mixing weights
    // -> (strata, n_items, n_tokens, weight, eff_epochs)
    registerTable("graft_mixture_weights", Seq(4), args =>
      plan(Sampling.temperatureWeights(table(strLit(args(0), "table")),
        strLit(args(1), "strataCol"), strLit(args(2), "sizeCol"),
        doubleLit(args(3), "alpha"))))

    // greedy token-budget selection: SELECTED input rows, priority desc
    registerTable("graft_token_budget", Seq(5), args =>
      plan(Sampling.tokenBudgetSelect(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "priorityCol"),
        strLit(args(3), "sizeCol"), intLit(args(4), "budget").toLong)))

    // CCNet perplexity bucketing -> (id, group, surprisal, bucket)
    registerTable("graft_ccnet_buckets", Seq(4, 6), args =>
      plan(if (args.length == 4)
        UnigramLM.perplexityBuckets(table(strLit(args(0), "table")),
          strLit(args(1), "idCol"), strLit(args(2), "textCol"),
          strLit(args(3), "groupCol"))
      else
        UnigramLM.perplexityBuckets(table(strLit(args(0), "table")),
          strLit(args(1), "idCol"), strLit(args(2), "textCol"),
          strLit(args(3), "groupCol"),
          doubleLit(args(4), "lo"), doubleLit(args(5), "hi"))))

    // exact triangle counts per node over an undirected edge view
    registerTable("graft_triangles", Seq(3), args =>
      plan(graft.operators.Triangles.perNode(table(strLit(args(0), "table")),
        strLit(args(1), "aCol"), strLit(args(2), "bCol"))))

    // funnel conversion table over an event view (steps comma-separated)
    registerTable("graft_funnel", Seq(5), args =>
      plan(graft.operators.Funnel.conversion(table(strLit(args(0), "table")),
        strLit(args(1), "userCol"), strLit(args(2), "typeCol"),
        strLit(args(3), "tsCol"),
        strLit(args(4), "steps").split(',').map(_.trim).toSeq)))

    // PMI collocations -> (a, b, c_ab, c_a, c_b, pmi)
    registerTable("graft_collocations", Seq(4), args =>
      plan(graft.operators.Collocations.pmiTopK(table(strLit(args(0), "table")),
        strLit(args(1), "textCol"), intLit(args(2), "minCount").toLong,
        intLit(args(3), "topK"))))

    // Jaro-Winkler pairs within first-token blocks
    registerTable("graft_fuzzy_pairs", Seq(4), args =>
      plan({
        val sc = strLit(args(2), "strCol")
        graft.operators.FuzzyJoin.jaroWinklerPairs(
          table(strLit(args(0), "table")), strLit(args(1), "idCol"), sc,
          graft.operators.FuzzyJoin.firstTokenKey(sc),
          doubleLit(args(3), "threshold"))
      }))

    // sorted-neighborhood Jaro-Winkler pairs (linear N*w blocking)
    registerTable("graft_fuzzy_neighborhood", Seq(5), args =>
      plan({
        val sc = strLit(args(2), "strCol")
        graft.operators.FuzzyJoin.sortedNeighborhoodPairs(
          table(strLit(args(0), "table")), strLit(args(1), "idCol"), sc, sc,
          intLit(args(3), "windowSize"), doubleLit(args(4), "threshold"))
      }))

    // cohort retention over an event view: day/week buckets via
    // periodMicros -> (cohort, offset, active_users, cohort_size, retention)
    registerTable("graft_retention", Seq(5), args =>
      plan(graft.operators.Retention.cohortRetention(
        table(strLit(args(0), "table")), strLit(args(1), "userCol"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col(strLit(args(2), "tsCol"))) /
          org.apache.spark.sql.functions.lit(longLit(args(3), "periodMicros"))),
        intLit(args(4), "maxOffset"))))

    // PageRank over an edge view -> (node, rank); weightCol '' = unweighted
    registerTable("graft_pagerank", Seq(5), args =>
      plan({
        val wc = strLit(args(3), "weightCol")
        graft.operators.PageRank.run(table(strLit(args(0), "table")),
          strLit(args(1), "srcCol"), strLit(args(2), "dstCol"),
          if (wc.isEmpty) None else Some(wc), intLit(args(4), "iters"))
      }))

    // z-order clustering rewrite: input rows + zv, range-partitioned and
    // in-partition sorted by the Morton value (cols arg comma-separated)
    registerTable("graft_zorder", Seq(4), args =>
      plan(graft.operators.ZOrder.zorderBy(table(strLit(args(0), "table")),
        strLit(args(1), "cols").split(',').map(_.trim).toSeq,
        intLit(args(2), "buckets"), intLit(args(3), "numPartitions"))))

    // embedding cluster profile -> (cent_id, n_members, majority_label,
    // purity, avg_cos)
    registerTable("graft_cluster_profile", Seq(5), args =>
      plan(SimilaritySearch.clusterProfile(table(strLit(args(0), "table")),
        strLit(args(1), "idCol"), strLit(args(2), "vecCol"),
        strLit(args(3), "labelCol"), intLit(args(4), "numCentroids"))))
  }
}
