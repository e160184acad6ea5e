package graft

import graft.functions.TextAnalysis

/** Longer DuckDB oracle texts, kept out of the SparkEntry map literal. Each
  * replicates the corresponding Spark plan's semantics exactly (same token
  * definition, same arithmetic shape, same rounding). */
object SparkEntryOracles {

  /** Exact word-3-gram Jaccard pairs at threshold 0.8 — oracle for both the
    * exact join formulation and the (exact-verified) MinHash-LSH pipeline. */
  val ngramJaccardPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> length(x) > 0) AS w
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, round(ix / (sa.n + sb.n - ix), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE ix / (sa.n + sb.n - ix) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** Dedup clustering oracle: the same exact-Jaccard pairs, then connected
    * components as a recursive transitive closure (component = min reachable
    * doc_id), then per-component membership. Mirrors
    * ConnectedComponents.components over Dedup.ngramJaccardPairs. */
  val dedupClustersSql: String =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> length(x) > 0) AS w
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE ix / (sa.n + sb.n - ix) >= 0.8),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)
      |SELECT component, count(*) AS n_docs,
      |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
      |FROM comp
      |GROUP BY component
      |ORDER BY component""".stripMargin

  /** Cluster keep-best replica: same recursive-CTE components as
    * dedupClustersSql, then per-component best member by (length(text)
    * DESC, doc_id ASC), singletons = their own component. */
  val dedupClusterKeepBestSql: String = {
    val prefix = dedupClustersSql.substring(0,
      dedupClustersSql.indexOf("comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)"))
    prefix +
      """comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
        |j AS (
        |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
        |    length(d.text) AS pref
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |cl AS (SELECT component, count(*) AS cluster_size FROM j GROUP BY component),
        |best AS (
        |  SELECT j.component, min(j.doc_id) AS rep_id
        |  FROM j JOIN (SELECT component, max(pref) AS mp FROM j GROUP BY component) m
        |    ON j.component = m.component AND j.pref = m.mp
        |  GROUP BY j.component)
        |SELECT j.doc_id, j.component, cl.cluster_size, best.rep_id,
        |  CAST(j.doc_id = best.rep_id AS INT) AS is_rep
        |FROM j JOIN cl USING (component) JOIN best USING (component)
        |ORDER BY j.doc_id""".stripMargin
  }

  /** Leakage-safe split replica: recursive-CTE components, each doc's
    * component (self for singletons) md5-thresholded at 0.2 of the hash
    * space — identical arithmetic to Sampling.leakageSafeSplit. */
  val splitLeakageSql: String = {
    val prefix = dedupClustersSql.substring(0,
      dedupClustersSql.indexOf("comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src)"))
    prefix +
      """comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
        |j AS (
        |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |s AS (
        |  SELECT doc_id, component,
        |    CASE WHEN md5(CAST(component AS VARCHAR)) <
        |        printf('%08x', CAST(floor(0.2 * 4294967296) AS BIGINT))
        |      THEN 'holdout' ELSE 'train' END AS split
        |  FROM j)
        |SELECT split, count(*) AS n_docs,
        |  count(DISTINCT component) AS n_components,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin
  }

  /** q_pipeline_e2e replica — the per-stage recipes COMPOSED as one CTE
    * chain, each stage reading its predecessor instead of `documents`:
    * normalize (nfc + control-strip + whitespace collapse) → exact dedup
    * (min id per case/whitespace-normalized key — the q_dedup_exact
    * string-key equivalence of the fingerprint hash) → word-3-gram
    * Jaccard ≥ 0.8 pairs (the exact oracle of the MinHash-LSH path) →
    * recursive-CTE connected components + keep-best (longest text, ties
    * → min id; the dedupClusterKeepBestSql recipe) → decontamination
    * (distinct-3-gram overlap ≥ 2 vs the doc_id % 97 = 0 benchmark; the
    * q_decontaminate recipe) → clean-vs-scrambled NB (the qualityNbSql
    * recipe, trained on the SURVIVING corpus, filter log-odds ≥ 0) →
    * mixture sample (q_mixture_sample md5-threshold recipe, 0.05 × 8000
    * tokens per source) → pack (q_pack_sequences exclusive-prefix-sum
    * recipe, budget 1000) → shard (q_shard_assign md5-permutation
    * recipe, 8 shards). Per-document lineage output — the one place a
    * cross-stage contract bug (id drift, ordering nondeterminism,
    * column mixups) cannot hide from per-stage oracles. */
  val pipelineE2eSql: String =
    """WITH RECURSIVE norm0 AS (
      |  SELECT doc_id, source,
      |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x{200B}-\x{200D}\x{FEFF}]', '', 'g'),
      |      '[ \t\n\x0B\x0C\r]+', ' ', 'g')) AS t
      |  FROM documents),
      |corp AS (SELECT * FROM norm0 WHERE doc_id % 97 <> 0),
      |bench AS (SELECT doc_id, t FROM norm0 WHERE doc_id % 97 = 0),
      |ex AS (
      |  SELECT doc_id, source, t FROM (
      |    SELECT doc_id, source, t,
      |      min(doc_id) OVER (PARTITION BY
      |        regexp_replace(lower(trim(t)), '\s+', ' ', 'g')) AS rep
      |    FROM corp) WHERE doc_id = rep),
      |toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(t)), '\s+'), x -> length(x) > 0) AS w
      |  FROM ex),
      |sh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM toks, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS u(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |prs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE ix / (sa.n + sb.n - ix) >= 0.8),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM prs
      |  UNION ALL SELECT id_b, id_a FROM prs),
      |reach(src, dst) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |comp AS (SELECT src AS id, min(dst) AS component FROM reach GROUP BY src),
      |j AS (
      |  SELECT e.doc_id, e.source, e.t,
      |    coalesce(c.component, e.doc_id) AS component, length(e.t) AS pref
      |  FROM ex e LEFT JOIN comp c ON e.doc_id = c.id),
      |best AS (
      |  SELECT j.component, min(j.doc_id) AS rep_id
      |  FROM j JOIN (SELECT component, max(pref) AS mp FROM j GROUP BY component) m
      |    ON j.component = m.component AND j.pref = m.mp
      |  GROUP BY j.component),
      |kb AS (
      |  SELECT j.doc_id, j.source, j.t
      |  FROM j JOIN best USING (component) WHERE j.doc_id = best.rep_id),
      |bt AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(t)), '\s+'), x -> length(x) > 0) AS w
      |  FROM bench),
      |bsh AS (
      |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      |  FROM bt, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS u(i)),
      |ovl AS (
      |  SELECT d.doc_id, b.doc_id AS bench_id, count(*) AS overlap
      |  FROM (SELECT sh.* FROM sh JOIN kb USING (doc_id)) d
      |  JOIN bsh b ON d.s = b.s
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |clean AS (
      |  SELECT * FROM kb
      |  WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM ovl)),
      |cw AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(t)), '\s+'), x -> length(x) > 0) AS w
      |  FROM clean),
      |pos AS (
      |  SELECT doc_id, w[i.x] || ' ' || w[i.x + 1] AS b
      |  FROM cw, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i(x)),
      |neg AS (
      |  SELECT doc_id, sw[i.x] || ' ' || sw[i.x + 1] AS b
      |  FROM (SELECT doc_id, list_sort(w) AS sw FROM cw) s,
      |       unnest(range(1, greatest(len(sw) - 1, 0) + 1)) AS i(x)),
      |cp AS (SELECT b, count(*)::BIGINT AS cp FROM pos GROUP BY b),
      |cn AS (SELECT b, count(*)::BIGINT AS cn FROM neg GROUP BY b),
      |vocab AS (
      |  SELECT coalesce(cp.b, cn.b) AS b, coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn
      |  FROM cp FULL JOIN cn ON cp.b = cn.b),
      |tot AS (SELECT sum(cp)::DOUBLE AS np, sum(cn)::DOUBLE AS nn,
      |  count(*)::DOUBLE AS v FROM vocab),
      |wt AS (
      |  SELECT b, ln(cp + 1.0) - ln(np + 1.0 * v) - ln(cn + 1.0) + ln(nn + 1.0 * v) AS w
      |  FROM vocab, tot),
      |sc AS (SELECT doc_id, sum(w) AS s FROM pos JOIN wt USING (b) GROUP BY doc_id),
      |qf AS (
      |  SELECT c.doc_id, c.source, c.t,
      |    round(coalesce(sc.s, 0.0), 6) AS nb_logodds
      |  FROM clean c LEFT JOIN sc USING (doc_id)
      |  WHERE round(coalesce(sc.s, 0.0), 6) >= 0.0),
      |wtok AS (
      |  SELECT doc_id, source, nb_logodds,
      |    CAST(len(list_filter(string_split_regex(lower(trim(t)), '\s+'),
      |      x -> length(x) > 0)) AS BIGINT) AS n_tok
      |  FROM qf),
      |cur AS (SELECT source, sum(n_tok) AS tot FROM wtok GROUP BY source),
      |frac AS (SELECT source, least(1.0, 0.05 * 8000 / tot) AS f FROM cur),
      |samp AS (
      |  SELECT w.doc_id, w.source, w.nb_logodds, w.n_tok
      |  FROM wtok w JOIN frac USING (source)
      |  WHERE f >= 1.0 OR md5(CAST(doc_id AS VARCHAR)) <
      |    printf('%08x', CAST(floor(f * 4294967296) AS BIGINT))),
      |pk AS (
      |  SELECT *,
      |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) // 1000 AS bin
      |  FROM samp),
      |sr AS (
      |  SELECT *,
      |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rn
      |  FROM pk)
      |SELECT doc_id, source, n_tok, nb_logodds, CAST(bin AS BIGINT) AS bin,
      |  CAST(rn % 8 AS INTEGER) AS shard, CAST(rn // 8 AS BIGINT) AS shard_pos
      |FROM sr ORDER BY doc_id""".stripMargin

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def hits(lang: String): String =
    s"len(list_filter(w, x -> list_contains(${sqlList(TextAnalysis.stopwords(lang))}, x)))"

  /** Replicates TextAnalysis.langId: CJK ratio then stopword argmax with
    * fixed preference order. */
  val langIdSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w,
       |    length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, text, cjk,
       |    ${hits("en")} AS s_en, ${hits("de")} AS s_de,
       |    ${hits("fr")} AS s_fr, ${hits("es")} AS s_es
       |  FROM toks),
       |pred AS (
       |  SELECT CASE
       |    WHEN cjk * 10 > length(text) * 3 THEN 'zh'
       |    WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
       |    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       |    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       |    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       |    ELSE 'es' END AS lang_pred
       |  FROM scored)
       |SELECT lang_pred, count(*) AS n FROM pred
       |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin

  /** q_lang_id_nb replica — the ENTIRE closed-form multinomial-NB
    * train+score chain re-derived from scratch in SQL: the labeled
    * fixture is inlined as VALUES from the SAME Scala constant the gate
    * trains on (LangIdNb.fixture — one source of truth, ASCII-only so
    * the literals quote cleanly), trigram counts / totals / vocabulary /
    * priors are exact-integer CTEs, the ln arithmetic mirrors the
    * operator term for term (wd = ln(c+1)−ln(1), dflt = ln(1)−ln(nl+v),
    * prior = ln(ns/total)), and the per-doc argmax tie-breaks on
    * ascending language code. No frozen frame anywhere — the strongest
    * oracle form (the SQ8 standard). Scores round to 4 decimals (the
    * matched-weight sum is a distributed double fold on the Spark side;
    * 1e-4 spacing absorbs summation-order noise by ~6 orders). */
  def langIdNbSql: String = {
    val values = graft.operators.LangIdNb.fixture
      .map { case (l, s) => s"('$l', '$s')" }.mkString(", ")
    langIdNbSqlOver(s"fix(lang, s) AS (VALUES $values)", "documents")
  }

  /** The supervised variant: train on the corpus's OWN labeled half
    * (even doc_ids, the table's lang column), score the odd half — the
    * distributed-training path of the same closed-form chain. */
  def langIdNbSupervisedSql: String =
    langIdNbSqlOver(
      "fix AS (SELECT lang, text AS s FROM documents WHERE doc_id % 2 = 0)",
      "(SELECT * FROM documents WHERE doc_id % 2 = 1)")

  /** The NB train+score chain with a pluggable labeled-training CTE and
    * scoring corpus — the fixture and supervised replays share every
    * byte of the model arithmetic. */
  private def langIdNbSqlOver(fixCte: String, docsFrom: String): String = {
    s"""WITH ${langIdNbCtes(fixCte, docsFrom)}
       |SELECT doc_id, lang AS lang_nb, round(score, 4) AS nb_score
       |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** The WITH-body of the NB chain (through the `rk` ranking CTE, no
    * final select) — composable, so the standalone lang-id gates and the
    * streaming-pipeline admission stage share every byte of the model
    * arithmetic. */
  private def langIdNbCtes(fixCte: String, docsFrom: String): String = {
    s"""$fixCte,
       |fn AS (SELECT lang, lower(trim(regexp_replace(s, '\\s+', ' ', 'g'))) AS t FROM fix),
       |fg AS (
       |  SELECT lang, substr(t, CAST(i AS INT), 3) AS g
       |  FROM fn, unnest(range(1, length(t) - 1)) AS u(i)),
       |cnt AS (SELECT lang, g, count(*) AS c FROM fg GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS nl FROM fg GROUP BY 1),
       |voc AS (SELECT count(DISTINCT g) AS v FROM fg),
       |pri AS (
       |  SELECT lang, ln(count(*) * 1.0 / (SELECT count(*) FROM fix)) AS prior
       |  FROM fix GROUP BY 1),
       |langs AS (
       |  SELECT t.lang, p.prior,
       |    ln(1.0) - ln(t.nl + 1.0 * (SELECT v FROM voc)) AS dflt
       |  FROM tot t JOIN pri p USING (lang)),
       |w AS (SELECT lang, g, ln(c + 1.0) - ln(1.0) AS wd FROM cnt),
       |d AS (
       |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
       |  FROM $docsFrom),
       |dn AS (SELECT doc_id, greatest(length(t) - 2, 0) AS n FROM d),
       |dg AS (
       |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS g
       |  FROM d, unnest(range(1, length(t) - 1)) AS u(i)),
       |ms AS (
       |  SELECT dg.doc_id, w.lang, sum(w.wd) AS ms
       |  FROM dg JOIN w ON w.g = dg.g GROUP BY 1, 2),
       |sc AS (
       |  SELECT dn.doc_id, l.lang,
       |    l.prior + dn.n * l.dflt + coalesce(ms.ms, 0.0) AS score
       |  FROM dn CROSS JOIN langs l
       |  LEFT JOIN ms ON ms.doc_id = dn.doc_id AND ms.lang = l.lang),
       |rk AS (
       |  SELECT doc_id, lang, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
       |  FROM sc)""".stripMargin
  }

  /** q_pipeline_stream replica — the streaming ingestion front-end as
    * one batch-mode derivation: fixture-NB language admission (the
    * langIdNbCtes chain verbatim), word-trigram exact-Jaccard near-dup
    * pairs over the ADMITTED docs (the ngramJaccardPairsSql arithmetic),
    * then the first-seen-wins drop rule — a doc is dropped iff some pair
    * partner precedes it in (arrival batch, doc_id) lexicographic order,
    * with batch = doc_id % 4 (the gate's deterministic micro-batching).
    * The per-batch pair union equals the batch-mode pair set (the
    * q_dedup_stream stream==batch argument), so the streamed lake equals
    * this derivation row-for-row. */
  val pipelineStreamSql: String = {
    val values = graft.operators.LangIdNb.fixture
      .map { case (l, s) => s"('$l', '$s')" }.mkString(", ")
    s"""WITH ${langIdNbCtes(s"fix(lang, s) AS (VALUES $values)", "documents")},
       |adm AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN rk ON rk.doc_id = d.doc_id AND rk.rn = 1 AND rk.lang = 'en'),
       |toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w
       |  FROM adm),
       |shp AS (
       |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |  FROM toks, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS t(i)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shp GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
       |  FROM shp a JOIN shp b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |prs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE ix / (sa.n + sb.n - ix) >= 0.8),
       |victims AS (
       |  SELECT DISTINCT CASE WHEN (id_a % 4, id_a) < (id_b % 4, id_b)
       |    THEN id_b ELSE id_a END AS doc_id FROM prs)
       |SELECT a.doc_id, CAST(a.doc_id % 4 AS BIGINT) AS batch,
       |  CAST(len(t.w) AS BIGINT) AS n_tok
       |FROM adm a JOIN toks t USING (doc_id)
       |WHERE a.doc_id NOT IN (SELECT doc_id FROM victims)
       |ORDER BY a.doc_id""".stripMargin
  }

  /** Flagship pipeline oracle: dedup representative (min doc_id per
    * normalized text) ∘ quality >= 0.5 ∘ lang 'en', per source. Reuses the
    * identical quality/langId arithmetic. */
  val corpusCleanSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    greatest(length(text), 1) AS n,
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w,
       |    length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk
       |  FROM documents),
       |t2 AS (
       |  SELECT doc_id, source, text, cjk, norm,
       |    doc_id = min(doc_id) OVER (PARTITION BY norm) AS is_rep,
       |    round(greatest(least(
       |      least(len(w) / 20.0, 1.0) * 0.4 +
       |      ((length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) * -1.0 / n + 1.0) * 0.3 +
       |      least(${hits("en")} * 1.0 / greatest(len(w), 1) * 5.0, 1.0) * 0.2 +
       |      (1.0 - least(((length(text) - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))) * -1.0 / n + 1.0) * 5.0, 1.0)) * 0.1,
       |      1.0), 0.0), 4) AS quality,
       |    CASE
       |      WHEN cjk * 10 > length(text) * 3 THEN 'zh'
       |      WHEN greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) = 0 THEN 'und'
       |      WHEN ${hits("en")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'en'
       |      WHEN ${hits("de")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'de'
       |      WHEN ${hits("fr")} = greatest(${hits("en")}, ${hits("de")}, ${hits("fr")}, ${hits("es")}) THEN 'fr'
       |      ELSE 'es' END AS lang_pred
       |  FROM t)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN is_rep AND quality >= 0.5 AND lang_pred = 'en'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
       |FROM t2
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Replicates TextAnalysis.qualityScore arithmetic shape exactly. */
  val qualityScoreSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    greatest(length(text), 1) AS n,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    (length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) * -1.0 / n + 1.0 AS alpha_ratio,
       |    (length(text) - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))) * -1.0 / n + 1.0 AS punct_ratio,
       |    ${hits("en")} * 1.0 / greatest(len(w), 1) AS stop_ratio,
       |    least(len(w) / 20.0, 1.0) AS len_score
       |  FROM t)
       |SELECT doc_id,
       |  round(greatest(least(
       |    len_score * 0.4 + alpha_ratio * 0.3 +
       |    least(stop_ratio * 5.0, 1.0) * 0.2 +
       |    (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.1, 1.0), 0.0), 4) AS quality
       |FROM c
       |ORDER BY doc_id""".stripMargin

  /** Shared pattern list for the substring-blocklist gate: real phrases
    * from the synthetic corpus vocabulary, one cross-token substring
    * ("der sor" spans "order sort"), one absent canary. */
  val substrBlocklistPatterns: Seq[String] = Seq(
    "batch batch", "slow sort", "join order", "spark window", "hash scan",
    "customer line", "der sor", "zzqq_absent_canary")

  /** Replicates SubstringBlocklist.matchPairs + the filterClean count:
    * per-pattern `contains` over the cross join (the naive O(text·P) plan
    * the Aho-Corasick kernel collapses to one pass) + a NOT EXISTS clean
    * row. */
  val substrBlocklistSql: String = {
    val lits = substrBlocklistPatterns.map(p => s"'$p'").mkString(", ")
    s"""WITH pats AS (SELECT unnest([$lits]) AS pattern),
       |pairs AS (
       |  SELECT doc_id, pattern FROM documents, pats
       |  WHERE contains(text, pattern)),
       |clean AS (
       |  SELECT CAST(-1 AS BIGINT) AS doc_id,
       |    'clean:' || CAST(count(*) AS VARCHAR) AS pattern
       |  FROM documents d
       |  WHERE NOT EXISTS (SELECT 1 FROM pats p WHERE contains(d.text, p.pattern)))
       |SELECT * FROM (SELECT * FROM pairs UNION ALL SELECT * FROM clean)
       |ORDER BY doc_id, pattern""".stripMargin
  }

  /** Replicates PageRank.run on the supplier co-supply graph: the same
    * edge construction, then 6 unrolled power iterations of
    * r'(v) = (1-d)/N + d·Σ r(u)·share(u,v) (the graph is symmetric, so
    * there are no dangling nodes and the dangling term vanishes). */
  val pagerankSql: String = {
    val d = 0.85
    val iters = (1 to 6).map { k =>
      s"""r$k AS (
         |  SELECT nodes.node,
         |    (1 - $d) / n + $d * coalesce(c.s, 0) AS rank
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT ne.dst, sum(r.rank * ne.share) AS s
         |    FROM ne JOIN r${k - 1} r ON ne.src = r.node GROUP BY 1) c
         |  ON nodes.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |eu AS (
       |  SELECT a.sk AS src, b.sk AS dst, CAST(count(*) AS DOUBLE) AS w
       |  FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY 1, 2),
       |e AS (SELECT src, dst, w FROM eu
       |      UNION ALL SELECT dst, src, w FROM eu),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |ne AS (
       |  SELECT e.src, e.dst, e.w / o.ow AS share
       |  FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY 1) o
       |  ON e.src = o.src),
       |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node AS supplier, round(rank, 7) AS rank
       |FROM r6 ORDER BY supplier""".stripMargin
  }

  /** Personalized-PageRank replica: same co-supply graph, teleport vector
    * t = normalized nation-0 seed weights, 6 unrolled iterations of
    * r'(v) = (1-d)·t(v) + d·Σ r(u)·share(u,v) (symmetric graph — no
    * dangling term). */
  val pagerankPersonalizedSql: String = {
    val d = 0.85
    val iters = (1 to 6).map { k =>
      s"""r$k AS (
         |  SELECT tv.node,
         |    (1 - $d) * tv.t + $d * coalesce(c.s, 0) AS rank
         |  FROM tv
         |  LEFT JOIN (
         |    SELECT ne.dst, sum(r.rank * ne.share) AS s
         |    FROM ne JOIN r${k - 1} r ON ne.src = r.node GROUP BY 1) c
         |  ON tv.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
       |eu AS (
       |  SELECT a.sk AS src, b.sk AS dst, CAST(count(*) AS DOUBLE) AS w
       |  FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
       |  GROUP BY 1, 2),
       |e AS (SELECT src, dst, w FROM eu
       |      UNION ALL SELECT dst, src, w FROM eu),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |ne AS (
       |  SELECT e.src, e.dst, e.w / o.ow AS share
       |  FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY 1) o
       |  ON e.src = o.src),
       |seeds AS (SELECT s_suppkey AS node, 1.0 AS sw FROM supplier
       |          WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)),
       |sv AS (SELECT seeds.node, sw FROM seeds JOIN nodes USING (node)),
       |tv AS (
       |  SELECT nodes.node,
       |    coalesce(s.sw, 0) / (SELECT sum(sw) FROM sv) AS t
       |  FROM nodes LEFT JOIN sv s ON nodes.node = s.node),
       |r0 AS (SELECT node, t AS rank FROM tv),
       |$iters
       |SELECT node AS supplier, round(rank, 7) AS rank
       |FROM r6 ORDER BY supplier""".stripMargin
  }

  /** Replicates ZOrder.zvalue over (l_partkey, l_suppkey) with 16 quantile
    * buckets per column: quantile_cont == Spark percentile for the
    * cutoffs, bucket = #cutoffs <= value, then the generated Morton
    * interleave term sum (bit k of column i at position 2k+i). */
  val zorderCellsSql: String = {
    val fracs = (1 to 15).map(j => s"${j / 16.0}").mkString(", ")
    val interleave = (0 until 4).flatMap { k =>
      Seq(s"((pb >> $k) & 1) * ${1L << (2 * k)}",
        s"((sb >> $k) & 1) * ${1L << (2 * k + 1)}")
    }.mkString(" + ")
    s"""WITH cuts AS (
       |  SELECT quantile_cont(l_partkey, [$fracs]) AS pc,
       |    quantile_cont(l_suppkey, [$fracs]) AS sc
       |  FROM lineitem),
       |b AS (
       |  SELECT l_partkey, l_suppkey,
       |    len(list_filter(pc, c -> l_partkey * 1.0 >= c)) AS pb,
       |    len(list_filter(sc, c -> l_suppkey * 1.0 >= c)) AS sb
       |  FROM lineitem, cuts),
       |z AS (SELECT l_partkey, l_suppkey, $interleave AS zv FROM b)
       |SELECT zv, CAST(count(*) AS BIGINT) AS n,
       |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
       |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
       |FROM z GROUP BY zv ORDER BY zv""".stripMargin
  }

  /** Replicates Sampling.tokenBudgetSelect over qualityScore priorities:
    * the bucket-prefix + in-bucket-prefix decomposition equals one global
    * running sum ordered by (quality DESC, doc_id). Same quality formula
    * as qualityScoreSql (rounded to 4dp BEFORE ordering, so both engines
    * order on identical doubles). */
  val tokenBudgetSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    greatest(length(text), 1) AS n,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, len(w) AS toks,
       |    (length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) * -1.0 / n + 1.0 AS alpha_ratio,
       |    (length(text) - length(regexp_replace(text, '[^.,!?;:]', '', 'g'))) * -1.0 / n + 1.0 AS punct_ratio,
       |    ${hits("en")} * 1.0 / greatest(len(w), 1) AS stop_ratio,
       |    least(len(w) / 20.0, 1.0) AS len_score
       |  FROM t),
       |q AS (
       |  SELECT doc_id, source, toks,
       |    round(greatest(least(
       |      len_score * 0.4 + alpha_ratio * 0.3 +
       |      least(stop_ratio * 5.0, 1.0) * 0.2 +
       |      (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.1, 1.0), 0.0), 4) AS quality
       |  FROM c),
       |sel AS (
       |  SELECT *, sum(toks) OVER (ORDER BY quality DESC, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM q)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_sel,
       |  CAST(sum(toks) AS BIGINT) AS tokens_sel,
       |  round(avg(quality), 4) AS avg_quality
       |FROM sel WHERE cum <= 50000 GROUP BY source ORDER BY source""".stripMargin

  /** Full bit-exact replica of the MULTI-PROBE lshTopK gate (operating
    * point interpolated from AnnConfig: lshBits-bit bands x lshBands,
    * 2^lshFlipBits probes per band): the hyperplane components are
    * deterministic integer arithmetic (splitmix-style index hash +
    * murmur3 fmix64 finalizer — HashKernels.planeComponent), replicated
    * here with HUGEINT wrap-multiply decomposed into 32-bit halves (a
    * 64x64 product can hit 2^128 and overflow INT128 taken whole). Plane
    * dots use list_dot_product = the same sequential double fold as the
    * kernel's loop, so sign bits, PROBE SELECTION (the flipped bits are
    * the per-band lowest |dot| margins, ties broken on plane index —
    * ORDER BY abs(dot), plane mirrors the kernel's (|dot|, bit) partial
    * selection), buckets, candidates, ranking and rounded cosines all
    * agree bit-for-bit. Keeps q_ann_lsh value-exact through the r12
    * multi-probe lift (recall 0.63 -> 0.81 at <=25% measured scan). */
  /** Multi-probe LSH replay over the full corpus — shared verbatim by
    * q_ann_lsh, q_ann_lsh_index, and q_ann_lsh_index_incremental (an
    * index-served / incrementally-ingested search EQUALS the from-scratch
    * result, so the same replay certifies all three). */
  val annLshSql: String = annLshSqlOver("")

  /** The same replay with a corpus predicate: `corpusWhere` (a boolean
    * SQL expression over embeddings columns, empty = all rows) filters
    * the ONE CTE every downstream step — signatures, buckets, probes,
    * scoring, ranking — derives from, which is exactly what deleting
    * vectors from a standing index does to the serve path. Used by the
    * tombstone-delete gate. */
  def annLshSqlOver(corpusWhere: String): String = {
    val corpusPred = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    val L = graft.operators.AnnConfig
    val bits = L.lshBits
    val planes = L.lshBits * L.lshBands
    val f = L.lshFlipBits
    val flCols = (1 to f)
      .map(i => s"max(CASE WHEN r = $i THEN bit END) AS b$i").mkString(",\n    ")
    def probeExpr(mask: Int): String =
      (0 until f).filter(b => (mask & (1 << b)) != 0)
        .foldLeft("s.sig")((acc, b) => s"xor($acc, (1::BIGINT << f.b${b + 1}))")
    val probeList = (0 until (1 << f)).map(probeExpr).mkString(",\n      ")
    s"""WITH pd AS (
      |  SELECT p.range AS plane, d.range AS dim,
      |    ((p.range::HUGEINT * 11400714819323198485 + d.range::HUGEINT * 13787848793156543929 + 42) % 18446744073709551616) AS u0
      |  FROM range($planes) p, range(64) d),
      |s1 AS (SELECT plane, dim, xor((CASE WHEN u0 >= 9223372036854775808 THEN u0 - 18446744073709551616 ELSE u0 END)::BIGINT, (u0 // 8589934592)::BIGINT) AS x1 FROM pd),
      |m2 AS (SELECT plane, dim, ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) AS u2 FROM s1),
      |s3 AS (SELECT plane, dim, xor((CASE WHEN u2 >= 9223372036854775808 THEN u2 - 18446744073709551616 ELSE u2 END)::BIGINT, (u2 // 8589934592)::BIGINT) AS x3 FROM m2),
      |m4 AS (SELECT plane, dim, ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) AS u4 FROM s3),
      |s5 AS (SELECT plane, dim, xor((CASE WHEN u4 >= 9223372036854775808 THEN u4 - 18446744073709551616 ELSE u4 END)::BIGINT, (u4 // 8589934592)::BIGINT) AS x5 FROM m4),
      |comp AS (SELECT plane, dim,
      |  ((CASE WHEN x5 < 0 THEN x5::HUGEINT + 18446744073709551616 ELSE x5::HUGEINT END) // 2048)::DOUBLE / 9007199254740992.0 * 2.0 - 1.0 AS c FROM s5),
      |pvec AS (SELECT plane, list(c ORDER BY dim) AS pv FROM comp GROUP BY plane),
      |vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings$corpusPred),
      |dots AS (SELECT vec_id, plane, list_dot_product(v, pv) AS dot FROM vecs CROSS JOIN pvec),
      |sigt AS (SELECT vec_id, (plane // $bits)::BIGINT AS band,
      |  sum(CASE WHEN dot >= 0 THEN 1 << (plane % $bits) ELSE 0 END)::BIGINT AS sig
      |  FROM dots GROUP BY 1, 2),
      |qm AS (
      |  SELECT vec_id, (plane // $bits)::BIGINT AS band, (plane % $bits)::BIGINT AS bit,
      |    row_number() OVER (PARTITION BY vec_id, plane // $bits
      |      ORDER BY abs(dot), plane) AS r
      |  FROM dots WHERE vec_id < ${L.maxQueries}),
      |fl AS (
      |  SELECT vec_id, band,
      |    $flCols
      |  FROM qm WHERE r <= $f GROUP BY 1, 2),
      |qprobes AS (
      |  SELECT s.vec_id, s.band, p.sig
      |  FROM sigt s
      |  JOIN fl f ON f.vec_id = s.vec_id AND f.band = s.band,
      |  UNNEST([$probeList]) AS p(sig)
      |  WHERE s.vec_id < ${L.maxQueries}),
      |cand AS (
      |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
      |  FROM qprobes q JOIN sigt c ON q.band = c.band AND q.sig = c.sig AND q.vec_id <> c.vec_id),
      |scored AS (
      |  SELECT q_id, c_id, list_dot_product(qv.v, cv.v) / (qv.nrm * cv.nrm) AS cos
      |  FROM cand JOIN vecs qv ON qv.vec_id = q_id JOIN vecs cv ON cv.vec_id = c_id),
      |ranked AS (
      |  SELECT q_id, c_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
      |  FROM scored)
      |SELECT q_id, c_id AS n_id, rank, round(cos, 6) AS cosine
      |FROM ranked WHERE rank <= ${L.k} ORDER BY q_id, rank""".stripMargin
  }

  /** Full bit-exact replica of simhashPairs (maxHamming=7, numChunks=4 —
    * the r12 widened contract): per-token FNV-1a 64 over UTF-8 bytes
    * (bytes derived from code points by the UTF-8 encoding arithmetic;
    * the wrapping multiply by the FNV prime and the fmix64 finalizer run
    * in HUGEINT with 32-bit-half decomposition), per-bit majority vote,
    * pigeonhole 16-bit chunk blocking PLUS one-bit-flip probe variants
    * (probes join exact keys, lower-id side probes — mirrors the
    * operator exactly), exact Hamming verify via bit_count(xor). Keeps
    * q_dedup_simhash value-exact at the widened operating point (the
    * planted-recall evidence stays — recall describes the 64-bit
    * signature's coarseness, the oracle the implementation). */
  val simhashPairsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    x -> length(x) > 0) AS w
      |  FROM documents),
      |tok AS (SELECT doc_id, t.tok FROM toks, unnest(w) AS t(tok)),
      |tb AS (SELECT doc_id, tok,
      |  flatten(list_transform(
      |    list_transform(range(1, length(tok) + 1), i -> unicode(substring(tok, i, 1))),
      |    cp -> CASE
      |      WHEN cp < 128 THEN [cp::BIGINT]
      |      WHEN cp < 2048 THEN [(192 + cp // 64)::BIGINT, (128 + cp % 64)::BIGINT]
      |      WHEN cp < 65536 THEN [(224 + cp // 4096)::BIGINT, (128 + (cp // 64) % 64)::BIGINT, (128 + cp % 64)::BIGINT]
      |      ELSE [(240 + cp // 262144)::BIGINT, (128 + (cp // 4096) % 64)::BIGINT, (128 + (cp // 64) % 64)::BIGINT, (128 + cp % 64)::BIGINT] END)) AS bs
      |  FROM tok),
      |f0 AS (SELECT doc_id, tok,
      |  list_reduce(list_prepend(-3750763034362895579::BIGINT, bs), (acc, b) -> (CASE WHEN ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT) AS h0 FROM tb),
      |f1 AS (SELECT doc_id, tok, xor(h0, ((CASE WHEN h0 < 0 THEN h0::HUGEINT + 18446744073709551616 ELSE h0::HUGEINT END) // 8589934592)::BIGINT) AS x1 FROM f0),
      |f2 AS (SELECT doc_id, tok, (CASE WHEN ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT AS x2 FROM f1),
      |f3 AS (SELECT doc_id, tok, xor(x2, ((CASE WHEN x2 < 0 THEN x2::HUGEINT + 18446744073709551616 ELSE x2::HUGEINT END) // 8589934592)::BIGINT) AS x3 FROM f2),
      |f4 AS (SELECT doc_id, tok, (CASE WHEN ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT AS x4 FROM f3),
      |f5 AS (SELECT doc_id, tok, xor(x4, ((CASE WHEN x4 < 0 THEN x4::HUGEINT + 18446744073709551616 ELSE x4::HUGEINT END) // 8589934592)::BIGINT) AS h FROM f4),
      |bits AS (
      |  SELECT doc_id, b.bit,
      |    sum(CASE WHEN ((CASE WHEN h < 0 THEN h::HUGEINT + 18446744073709551616 ELSE h::HUGEINT END) // (1::HUGEINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM f5, unnest(range(64)) AS b(bit) GROUP BY 1, 2),
      |sigs AS (
      |  SELECT doc_id, (CASE WHEN sum(CASE WHEN vote > 0 THEN (1::HUGEINT << bit) ELSE 0 END) >= 9223372036854775808 THEN sum(CASE WHEN vote > 0 THEN (1::HUGEINT << bit) ELSE 0 END) - 18446744073709551616 ELSE sum(CASE WHEN vote > 0 THEN (1::HUGEINT << bit) ELSE 0 END) END)::BIGINT AS sig
      |  FROM bits GROUP BY doc_id),
      |chunks AS (
      |  SELECT doc_id, sig, c.chunk, (((CASE WHEN sig < 0 THEN sig::HUGEINT + 18446744073709551616 ELSE sig::HUGEINT END) // (1::HUGEINT << (c.chunk * 16))) % 65536)::BIGINT AS bits
      |  FROM sigs, unnest(range(4)) AS c(chunk)),
      |probes AS (
      |  SELECT doc_id, sig, chunk, bits FROM chunks
      |  UNION ALL
      |  SELECT doc_id, sig, chunk, xor(bits, (1::BIGINT << b.bit)) AS bits
      |  FROM chunks, unnest(range(16)) AS b(bit)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b, x.sig AS siga, y.sig AS sigb
      |  FROM probes x JOIN chunks y ON x.chunk = y.chunk AND x.bits = y.bits AND x.doc_id < y.doc_id)
      |SELECT id_a, id_b, bit_count(xor(siga, sigb)) AS hamming
      |FROM cand WHERE bit_count(xor(siga, sigb)) <= 7
      |ORDER BY id_a, id_b""".stripMargin

  /** Full bit-exact replica of q_sketch_tokens: the Count-Min sketch is
    * a deterministic function of the token multiset — counters(d, bucket)
    * = count of input tokens hashing there (seeded FNV-1a + fmix64,
    * floorMod width; seeds wrap at d*GOLDEN mod 2^64 exactly as the JVM
    * Long multiply does) and est = min over depths, with absent probes
    * hitting empty cells via the left join's coalesce(0). */
  val cmsTokensSql: String =
    """WITH seeds AS (
      |  SELECT d.range AS d,
      |    xor((CASE WHEN 14695981039346656037 >= 9223372036854775808 THEN 14695981039346656037 - 18446744073709551616 ELSE 14695981039346656037 END)::BIGINT, (CASE WHEN ((d.range::HUGEINT * 11400714819323198485) % 18446744073709551616) >= 9223372036854775808 THEN ((d.range::HUGEINT * 11400714819323198485) % 18446744073709551616) - 18446744073709551616 ELSE ((d.range::HUGEINT * 11400714819323198485) % 18446744073709551616) END)::BIGINT) AS h0
      |  FROM range(4) d),
      |toks AS (
      |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    x -> length(x) > 0) AS w
      |  FROM documents),
      |tok AS (SELECT t.tok FROM toks, unnest(w) AS t(tok)),
      |probes AS (SELECT * FROM (VALUES ('the'), ('a'), ('data'), ('spark'), ('zz_absent')) p(tok)),
      |allstr AS (SELECT tok, true AS is_input FROM tok
      |           UNION ALL SELECT tok, false FROM probes),
      |tb AS (SELECT tok, is_input,
      |  flatten(list_transform(
      |    list_transform(range(1, length(tok) + 1), i -> unicode(substring(tok, i, 1))),
      |    cp -> CASE
      |      WHEN cp < 128 THEN [cp::BIGINT]
      |      WHEN cp < 2048 THEN [(192 + cp // 64)::BIGINT, (128 + cp % 64)::BIGINT]
      |      WHEN cp < 65536 THEN [(224 + cp // 4096)::BIGINT, (128 + (cp // 64) % 64)::BIGINT, (128 + cp % 64)::BIGINT]
      |      ELSE [(240 + cp // 262144)::BIGINT, (128 + (cp // 4096) % 64)::BIGINT, (128 + (cp // 64) % 64)::BIGINT, (128 + cp % 64)::BIGINT] END)) AS bs
      |  FROM allstr),
      |f0 AS (SELECT tok, is_input, s.d,
      |  list_reduce(list_prepend(s.h0, bs), (acc, b) -> (CASE WHEN ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 435 + ((((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) % 4294967296) * 256 + ((CASE WHEN xor(acc, b) < 0 THEN xor(acc, b)::HUGEINT + 18446744073709551616 ELSE xor(acc, b)::HUGEINT END) // 4294967296) * 435) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT) AS h0f
      |  FROM tb CROSS JOIN seeds s),
      |f1 AS (SELECT tok, is_input, d, xor(h0f, ((CASE WHEN h0f < 0 THEN h0f::HUGEINT + 18446744073709551616 ELSE h0f::HUGEINT END) // 8589934592)::BIGINT) AS x1 FROM f0),
      |f2 AS (SELECT tok, is_input, d, (CASE WHEN ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 3981806797 + ((((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) % 4294967296) * 4283543511 + ((CASE WHEN x1 < 0 THEN x1::HUGEINT + 18446744073709551616 ELSE x1::HUGEINT END) // 4294967296) * 3981806797) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT AS x2 FROM f1),
      |f3 AS (SELECT tok, is_input, d, xor(x2, ((CASE WHEN x2 < 0 THEN x2::HUGEINT + 18446744073709551616 ELSE x2::HUGEINT END) // 8589934592)::BIGINT) AS x3 FROM f2),
      |f4 AS (SELECT tok, is_input, d, (CASE WHEN ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) >= 9223372036854775808 THEN ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) - 18446744073709551616 ELSE ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 444984403 + ((((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) % 4294967296) * 3301882366 + ((CASE WHEN x3 < 0 THEN x3::HUGEINT + 18446744073709551616 ELSE x3::HUGEINT END) // 4294967296) * 444984403) % 4294967296) * 4294967296) % 18446744073709551616) END)::BIGINT AS x4 FROM f3),
      |f5 AS (SELECT tok, is_input, d, xor(x4, ((CASE WHEN x4 < 0 THEN x4::HUGEINT + 18446744073709551616 ELSE x4::HUGEINT END) // 8589934592)::BIGINT) AS h FROM f4),
      |bucketed AS (SELECT tok, is_input, d, ((CASE WHEN h < 0 THEN h::HUGEINT + 18446744073709551616 ELSE h::HUGEINT END) % 4096)::BIGINT AS bucket FROM f5),
      |counters AS (
      |  SELECT d, bucket, count(*)::BIGINT AS c FROM bucketed WHERE is_input GROUP BY 1, 2),
      |probe_est AS (
      |  SELECT b.tok, min(coalesce(c.c, 0)) AS est
      |  FROM (SELECT DISTINCT tok, d, bucket FROM bucketed WHERE NOT is_input) b
      |  LEFT JOIN counters c ON c.d = b.d AND c.bucket = b.bucket
      |  GROUP BY b.tok)
      |SELECT tok AS token, est::BIGINT AS est_count FROM probe_est ORDER BY token""".stripMargin

  /** Shared skeleton of the BPE-training recursion (all four BPE oracles):
    * a RECURSIVE CTE carries the symbolized distinct-word table; each step
    * the working table aggregates adjacent pair counts, takes the argmax
    * (count desc, then (left, right) — DuckDB's binary collation IS the
    * UTF-8 byte order the trainer tie-breaks on; for the byte tier the
    * symbols are lowercase-hex strings, whose per-case-monotone alphabet
    * makes string order equal byte order too), and applies the merge to
    * every word. Symbol sequences ride as strings with TAB separators
    * (tab is whitespace, so it provably never occurs inside a token):
    * enc = TAB sym TAB TAB sym TAB ..., and the merge is one
    * non-overlapping left-to-right replace of TAB l TAB TAB r TAB —
    * exactly applyMerge's greedy scan, boundary-safe because a symbol
    * can never contain TAB. The long-standing "iterative global argmax
    * has no SQL form" note was wrong: the working table of a recursive
    * CTE is precisely one training round. `baseEnc` is the SQL expression
    * symbolizing word `w` into the initial enc string — per-code-point +
    * '</w>' for the word-internal tier, space-prefixed UTF-8 bytes as
    * lowercase hex pairs (the GPT-2 formulation) for the byte tier. */
  private def bpeStateSql(baseEnc: String, numMerges: Int = 16): String =
    raw"""wc AS (
      |  SELECT t.tok AS w, count(*)::BIGINT AS c
      |  FROM (SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |          x -> length(x) > 0) AS ws FROM documents) d,
      |       unnest(d.ws) AS t(tok)
      |  GROUP BY t.tok),
      |base AS (
      |  SELECT 0 AS it, 'w' AS kind,
      |    $baseEnc AS enc,
      |    c, NULL::BIGINT AS rank, NULL::VARCHAR AS ml, NULL::VARCHAR AS mr,
      |    NULL::BIGINT AS pc
      |  FROM wc),
      |state(it, kind, enc, c, rank, ml, mr, pc) AS (
      |  SELECT * FROM base
      |  UNION ALL
      |  (
      |  WITH prev AS (SELECT * FROM state),
      |  syms AS (
      |    SELECT enc, c,
      |      list_transform(string_split(enc, chr(9) || chr(9)),
      |        s -> trim(s, chr(9))) AS sl
      |    FROM prev WHERE kind = 'w'),
      |  pairs AS (
      |    SELECT sl[i.x] AS l, sl[i.x + 1] AS r, sum(c)::BIGINT AS pc
      |    FROM syms, unnest(range(1, len(sl))) AS i(x)
      |    GROUP BY 1, 2 HAVING sum(c) >= 2),
      |  best AS (SELECT l, r, pc FROM pairs ORDER BY pc DESC, l, r LIMIT 1),
      |  curit AS (SELECT max(it) AS it FROM prev)
      |  SELECT curit.it + 1, 'w',
      |    replace(p.enc, chr(9) || b.l || chr(9) || chr(9) || b.r || chr(9),
      |      chr(9) || b.l || b.r || chr(9)),
      |    p.c, NULL, NULL, NULL, NULL
      |  FROM prev p, best b, curit WHERE p.kind = 'w' AND curit.it < $numMerges
      |  UNION ALL
      |  SELECT curit.it + 1, 'm', NULL, NULL, curit.it + 1, b.l, b.r, b.pc
      |  FROM best b, curit WHERE curit.it < $numMerges
      |  )
      |)""".stripMargin

  /** Initial symbolization, word-internal tier: one symbol per code
    * point, plus the '</w>' end-of-word marker. */
  private val bpeWordEnc: String =
    "chr(9) || array_to_string(list_append(list_transform(" +
      "range(1, length(w) + 1), i -> substring(w, i, 1)), '</w>'), " +
      "chr(9) || chr(9)) || chr(9)"

  /** Initial symbolization, byte tier: the UTF-8 bytes of the
    * SPACE-PREFIXED word, each as a lowercase two-hex-digit symbol —
    * DuckDB's hex() of a VARCHAR is the hex of its UTF-8 bytes, split
    * into pairs. Mirrors Bpe.symbolizeBytes exactly. */
  private val bpeByteEnc: String =
    "chr(9) || array_to_string(list_transform(" +
      "range(1, length(hex(' ' || w)) // 2 + 1), " +
      "i -> lower(substring(hex(' ' || w), 2 * i - 1, 2))), " +
      "chr(9) || chr(9)) || chr(9)"

  private def bpeMergesSqlFor(baseEnc: String, numMerges: Int = 16): String =
    raw"""WITH RECURSIVE
      |${bpeStateSql(baseEnc, numMerges)}
      |SELECT rank::INT AS rank, ml AS "left", mr AS "right", pc AS pair_count
      |FROM state WHERE kind = 'm' ORDER BY rank""".stripMargin

  /** Encode replica: the FINAL iteration of the training recursion IS the
    * encoded distinct-word table (each word's symbol sequence after all 16
    * merges — sequential rank-order application equals the rank-priority
    * encoder because a merge's operand symbols are created strictly
    * earlier and pre-existing-symbol adjacencies are never created, so
    * each pair is merged exhaustively exactly once). Each document's
    * tokens join to their segmentations and aggregate in (token, subword)
    * order into the same md5 witness as the gate. `segmapKey` recovers the
    * join key from a final symbol sequence (concat-and-strip-'</w>' for
    * the word tier, plain hex concat for the byte tier); `dtokKey` renders
    * a corpus token into the same key space. */
  private def bpeEncodeSqlFor(baseEnc: String, segmapKey: String,
                              dtokKey: String): String =
    raw"""WITH RECURSIVE
      |${bpeStateSql(baseEnc)},
      |final AS (
      |  SELECT list_transform(string_split(enc, chr(9) || chr(9)),
      |           s -> trim(s, chr(9))) AS segs
      |  FROM state
      |  WHERE kind = 'w' AND it = (SELECT max(it) FROM state WHERE kind = 'w')),
      |segmap AS (
      |  SELECT $segmapKey AS w, segs FROM final),
      |dtok AS (
      |  SELECT d.doc_id, i.x AS pos, $dtokKey AS w
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |          x -> length(x) > 0) AS ws FROM documents) d,
      |       unnest(range(1, len(d.ws) + 1)) AS i(x)),
      |sub AS (
      |  SELECT t.doc_id, t.pos, j.y AS spos, m.segs[j.y] AS sub
      |  FROM dtok t JOIN segmap m USING (w),
      |       unnest(range(1, len(m.segs) + 1)) AS j(y)),
      |perdoc AS (
      |  SELECT doc_id, count(*)::INT AS n_tokens,
      |    md5(string_agg(sub, chr(31) ORDER BY pos, spos)) AS tokens_md5
      |  FROM sub GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
      |  coalesce(p.tokens_md5, md5('')) AS tokens_md5
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN perdoc p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Full bit-exact replica of BPE training (q_bpe_merges, 16 merges,
    * minCount 2) — see [[bpeStateSql]]. */
  val bpeMergesSql: String = bpeMergesSqlFor(bpeWordEnc)

  /** q_bpe_merges_256 replica: the SAME recursion, 256 rounds — the
    * realistic-vocabulary tier. The replay is depth-agnostic (one
    * recursive step per merge), so promoting the merge count needs no
    * new oracle machinery; if the corpus exhausts pairs >= minCount
    * early, `best` comes back empty and BOTH sides stop on the same
    * round. */
  val bpeMerges256Sql: String = bpeMergesSqlFor(bpeWordEnc, 256)

  /** q_bpe_encode replica — see [[bpeEncodeSqlFor]]. */
  val bpeEncodeSql: String = bpeEncodeSqlFor(bpeWordEnc,
    "left(array_to_string(segs, ''), length(array_to_string(segs, '')) - 4)",
    "d.ws[i.x]")

  /** q_bpe_merges_bytes replica: same recursion over the byte-tier
    * alphabet (space-prefixed UTF-8 bytes as lowercase hex pairs, no
    * end-of-word marker — the GPT-2-family formulation). */
  val bpeMergesBytesSql: String = bpeMergesSqlFor(bpeByteEnc)

  /** q_bpe_encode_bytes replica: byte-tier final-state segmentation,
    * keyed on the word's full hex encoding (a final symbol sequence
    * concatenates back to exactly that hex string). */
  val bpeEncodeBytesSql: String = bpeEncodeSqlFor(bpeByteEnc,
    "array_to_string(segs, '')",
    "lower(hex(' ' || d.ws[i.x]))")

  /** q_quality_nb replica: exact bigram counts per class (positives =
    * documents, negatives = token-sorted documents), Laplace-smoothed
    * log-odds summed per document. Closed-form training means the whole
    * trained-classifier pipeline is value-exact under SQL (the L-BFGS
    * tier keeps its rows-only + holdout-AUC evidence). */
  val qualityNbSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |    x -> length(x) > 0) AS w
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, w[i.x] || ' ' || w[i.x + 1] AS b
      |  FROM toks, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i(x)),
      |neg AS (
      |  SELECT doc_id, sw[i.x] || ' ' || sw[i.x + 1] AS b
      |  FROM (SELECT doc_id, list_sort(w) AS sw FROM toks) s,
      |       unnest(range(1, greatest(len(sw) - 1, 0) + 1)) AS i(x)),
      |cp AS (SELECT b, count(*)::BIGINT AS cp FROM pos GROUP BY b),
      |cn AS (SELECT b, count(*)::BIGINT AS cn FROM neg GROUP BY b),
      |vocab AS (
      |  SELECT coalesce(cp.b, cn.b) AS b, coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn
      |  FROM cp FULL JOIN cn ON cp.b = cn.b),
      |tot AS (SELECT sum(cp)::DOUBLE AS np, sum(cn)::DOUBLE AS nn,
      |  count(*)::DOUBLE AS v FROM vocab),
      |wt AS (
      |  SELECT b, ln(cp + 1.0) - ln(np + 1.0 * v) - ln(cn + 1.0) + ln(nn + 1.0 * v) AS w
      |  FROM vocab, tot),
      |sc AS (SELECT doc_id, sum(w) AS s FROM pos JOIN wt USING (b) GROUP BY doc_id)
      |SELECT d.doc_id, round(coalesce(sc.s, 0.0), 6) AS nb_logodds
      |FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sc USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // ANN split-gate oracles: the gate freezes its trained codebooks /
  // centroids under SparkEntry.frozenRoot (hive-partitioned by corpus row
  // count); these replays select their partition with WHERE n = count(*)
  // and replicate the DETERMINISTIC half — encode, probe, ADC scan, exact
  // re-rank — term-for-term. Bit-exactness discipline: every JVM
  // ascending-index fold maps to either list_dot_product (proven
  // bit-identical to the array_dot codegen) or an EXPLICIT left-
  // associative term expansion (SQL's `a+b+c` parses ((a+b)+c), exactly
  // the kernel's `acc += term` order; the JVM's 0.0+t0 == t0).
  // ---------------------------------------------------------------------

  /** DuckDB replica of SparkEntry.corpusSig's content token: the same
    * bounded-integer per-row hash of (vec_id, first AND last coordinate),
    * summed — pmod semantics spelled out since DuckDB's % keeps the
    * dividend's sign while Spark's pmod is always non-negative; that wrap
    * is applied to the INNER vec_id mod too, so a corpus with negative
    * vec_ids still derives the identical token on both sides. Each floor
    * term is pmod-clamped to [0, 1e9) BEFORE the sum (matching corpusSig),
    * so the BIGINT expression is bounded at any coordinate magnitude —
    * unclamped, pathological embeddings overflowed here (raise) while
    * Spark wrapped silently, diverging the two sides (r13 ADVICE).
    * list_extract(v, -1) indexes from the tail, matching Spark's
    * element_at(v, -1). */
  private val corpusTokenSql: String = {
    def term(ix: Int): String =
      s"""((CAST(floor(list_extract(CAST(embedding AS DOUBLE[]), $ix) * 4096) AS BIGINT)
         |   % 1000000000 + 1000000000) % 1000000000)""".stripMargin
    s"""(SELECT CAST(SUM((((((vec_id % 2147483648) + 2147483648) % 2147483648) * 2654435761
       |   + ${term(1)}
       |   + ${term(-1)})
       |   % 1000000000 + 1000000000) % 1000000000) AS BIGINT) FROM embeddings)""".stripMargin
  }

  /** Frozen-frame reader: hive n=<count>/h=<token> partition matching the
    * corpus by BOTH row count and content token — a frame frozen from a
    * different equal-count corpus can never be selected. */
  private def frozenScan(gate: String, part: String): String =
    s"""read_parquet('/tmp/graft_frozen/$gate/$part/*/*/*.parquet',
       |    hive_partitioning=true)
       |  WHERE CAST(n AS BIGINT) = (SELECT count(*) FROM embeddings)
       |    AND CAST(h AS BIGINT) = $corpusTokenSql""".stripMargin

  /** Expanded per-subspace squared-L2 distance, ascending-index
    * left-associative — replicates SimilaritySearch.encodeOne's
    * `d += diff*diff` fold over the 8-element subvector exactly. */
  private def sqL2Terms(vExpr: String, offExpr: String, cwExpr: String,
                        subLen: Int): String =
    (1 to subLen).map { i =>
      s"($vExpr[$offExpr+$i]-$cwExpr[$i])*($vExpr[$offExpr+$i]-$cwExpr[$i])"
    }.mkString(" + ")

  /** Left-associative pivot sum over the m per-subspace rows — replicates
    * the ADC kernel's ascending-j `acc += lut(j)` fold exactly. */
  private def pivotSum(colName: String, m: Int): String =
    (0 until m).map(j => s"max(CASE WHEN j=$j THEN $colName END)")
      .mkString(" + ")

  /** Shared ADC CTE chain ending in `pqranked` (q_id, n_id, cos, rank
    * <= k): per-(query, candidate-code) approx cosine from the pivoted
    * LUT terms, global top-R by (approx DESC, n_id), exact re-rank — the
    * pqRerank replica. Expects CTEs `v` (id, v, nrm), `q` (q_id, qv,
    * qn), `pairsrc` (q_id, id — the candidate code pairs) and `enc`
    * (id, j, cw, cn2) in scope. Composable: callers append their own
    * final SELECT (the plain gates) or further CTEs (the hybrid
    * fusion). */
  private def adcRankedCtes(m: Int, subLen: Int, k: Int, r: Int): String =
    s"""pqt AS (
       |  SELECT p.q_id, p.id, e.j,
       |    list_dot_product(q.qv[e.j*$subLen+1 : e.j*$subLen+$subLen], e.cw) AS t,
       |    e.cn2 AS c
       |  FROM pairsrc p
       |  JOIN enc e ON e.id = p.id
       |  JOIN q ON q.q_id = p.q_id),
       |ssum AS (
       |  SELECT q_id, id,
       |    ${pivotSum("t", m)} AS adot,
       |    ${pivotSum("c", m)} AS n2
       |  FROM pqt GROUP BY q_id, id),
       |approx AS (
       |  SELECT s.q_id, s.id AS n_id, s.adot / (q.qn * sqrt(s.n2)) AS ap
       |  FROM ssum s JOIN q ON q.q_id = s.q_id
       |  WHERE s.id <> s.q_id AND sqrt(s.n2) > 0),
       |cand AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY ap DESC, n_id) AS r0
       |    FROM approx) WHERE r0 <= $r),
       |rer AS (
       |  SELECT c.q_id, c.n_id,
       |    list_dot_product(q.qv, v.v) / (q.qn * v.nrm) AS cos
       |  FROM cand c JOIN q ON q.q_id = c.q_id JOIN v ON v.id = c.n_id),
       |pqranked AS (
       |  SELECT q_id, n_id, cos, rank FROM (
       |    SELECT q_id, n_id, cos,
       |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |    FROM rer) WHERE rank <= $k)""".stripMargin

  private val pqFinalSelect: String =
    """SELECT q_id, n_id, rank, round(cos, 6) AS cosine FROM pqranked
      |ORDER BY q_id, rank""".stripMargin

  /** Corpus + query prep and PQ encode (per-(id, subspace) nearest
    * codeword by expanded squared L2, ties -> lowest codeword — the
    * encodeOne replica) against the gate's frozen codebooks. */
  private def pqPreludeSql(gate: String, subLen: Int, maxQ: Int,
                           corpusWhere: String = ""): String = {
    val corpusPred = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    pqPreludeSqlWithV(gate, subLen, maxQ,
      s"""v AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings$corpusPred)""".stripMargin)
  }

  /** The flat-PQ prelude with a PLUGGABLE corpus CTE (`v` = (id, v,
    * nrm)) — so the raw and rotated (OPQ) replays share every byte of
    * the codebook-scan + encode arithmetic and can never drift
    * (residualReplayCore's pattern, applied to the flat family). */
  private def pqPreludeSqlWithV(gate: String, subLen: Int, maxQ: Int,
                                vPrelude: String): String = {
    s"""WITH cb AS (
       |  SELECT CAST(subspace AS INT) AS j, CAST(codeword AS INT) AS w,
       |    vec::DOUBLE[] AS cw,
       |    list_dot_product(vec::DOUBLE[], vec::DOUBLE[]) AS cn2
       |  FROM ${frozenScan(gate, "codebooks")}),
       |$vPrelude,
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM v WHERE id < $maxQ),
       |enc AS (
       |  SELECT id, j, cw, cn2 FROM (
       |    SELECT v.id, cb.j, cb.w, cb.cw, cb.cn2,
       |      row_number() OVER (PARTITION BY v.id, cb.j ORDER BY
       |        ${sqL2Terms("v.v", s"cb.j*$subLen", "cb.cw", subLen)}, cb.w) AS rn
       |    FROM v CROSS JOIN cb)
       |  WHERE rn = 1)""".stripMargin
  }

  // The oracle constants are string-interpolated from the SAME AnnConfig
  // object the gates run with (m, subLen, k, r = k·rerankFactor, query
  // cutoffs) — retuning a gate default re-derives the SQL with it.
  private val A = graft.operators.AnnConfig

  /** q_ann_pq / q_ann_pq_index replica: full ADC scan (every query scores
    * every code), then the shared top-R + exact re-rank tail. */
  def annPqSql(gate: String): String = annPqSqlOver(gate, "")

  /** The same ADC replay with a corpus predicate on the one `v` CTE every
    * downstream step (encode, pair generation, re-rank) derives from —
    * exactly what tombstone-deleting ids from a PqIndex does to the
    * serve path. The frozen codebooks stay those of the FULL corpus the
    * gate trained on (deletion does not retrain the quantizer). */
  def annPqSqlOver(gate: String, corpusWhere: String): String =
    s"""${pqPreludeSql(gate, subLen = A.subLen, maxQ = A.maxQueries,
           corpusWhere = corpusWhere)},
       |pairsrc AS (SELECT q.q_id, v.id FROM q CROSS JOIN v),
       |${adcRankedCtes(m = A.numSubspaces, subLen = A.subLen, k = A.k, r = A.rerankR)}
       |$pqFinalSelect""".stripMargin

  /** q_ann_pq_opq_index replica — FAISS OPQMatrix → IndexPQ: the flat
    * ADC replay run entirely in ROTATED space. Only the corpus CTE
    * changes — each vector rotated against the gate's FROZEN rotation
    * frame (list_dot_product(rv, v) ORDER BY i: the exact ascending
    * left-associative fold the Scala matVec kernel computes) before the
    * shared encode/ADC/re-rank chain. Orthogonality makes rotated
    * cosines the original ones; value-exactness holds because both
    * sides compute identical rotated doubles from the identical frozen
    * frame (annIvfPqOpqSqlOver's argument, flat family). */
  def annPqOpqSql(gate: String): String =
    s"""${pqPreludeSqlWithV(gate, subLen = A.subLen, maxQ = A.maxQueries,
           vPrelude = s"""rot AS (
         |  SELECT CAST(i AS INT) AS i, rvec::DOUBLE[] AS rv
         |  FROM ${frozenScan(gate, "rotation")}),
         |vraw AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v0 FROM embeddings),
         |vrot AS (
         |  SELECT vr.id, list(list_dot_product(r.rv, vr.v0) ORDER BY r.i) AS v
         |  FROM vraw vr CROSS JOIN rot r GROUP BY vr.id),
         |v AS (
         |  SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vrot)""".stripMargin)},
       |pairsrc AS (SELECT q.q_id, v.id FROM q CROSS JOIN v),
       |${adcRankedCtes(m = A.numSubspaces, subLen = A.subLen, k = A.k, r = A.rerankR)}
       |$pqFinalSelect""".stripMargin

  /** Corpus + query prep and SQ8 encode for the scalar-quantized gates —
    * the one quantized family with NO frozen frame: the per-dimension
    * min/max quantizer is re-derived FROM SCRATCH here (stats always
    * over the FULL corpus — deletion never retrains, so the delete
    * variant's predicate applies only to the serving CTE `v`), codewords
    * expanded as `min_j + w·(max_j−min_j)/(levels−1)` — the exact
    * double-arithmetic sequence sqCodebooksDf computes — then the same
    * argmin encode replica as PQ with subLen = 1 (ties → lowest
    * codeword, matching encodeOne). `statsWhere` scopes the corpus the
    * QUANTIZER trained on (the incremental gate builds its ranges on the
    * standing batch only); `corpusWhere` scopes the corpus SERVED (the
    * delete gate masks tombstoned ids). */
  private def sqPreludeSql(maxQ: Int, levels: Int,
                           corpusWhere: String = "",
                           statsWhere: String = ""): String = {
    val corpusPred = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    val statsPred = if (statsWhere.isEmpty) "" else s" WHERE $statsWhere"
    s"""WITH stats AS (
       |  SELECT j, min(x) AS mn, max(x) AS mx FROM (
       |    SELECT generate_subscripts(ev, 1) - 1 AS j, unnest(ev) AS x
       |    FROM (SELECT embedding::DOUBLE[] AS ev FROM embeddings$statsPred))
       |  GROUP BY j),
       |cb AS (
       |  SELECT j, w, cw, list_dot_product(cw, cw) AS cn2 FROM (
       |    SELECT s.j, ws.w,
       |      [s.mn + ws.w * ((s.mx - s.mn) / ${levels - 1}.0)] AS cw
       |    FROM stats s CROSS JOIN
       |      (SELECT unnest(generate_series(0, ${levels - 1})) AS w) ws)),
       |v AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings$corpusPred),
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM v WHERE id < $maxQ),
       |enc AS (
       |  SELECT id, j, cw, cn2 FROM (
       |    SELECT v.id, cb.j, cb.w, cb.cw, cb.cn2,
       |      row_number() OVER (PARTITION BY v.id, cb.j ORDER BY
       |        ${sqL2Terms("v.v", "cb.j*1", "cb.cw", 1)}, cb.w) AS rn
       |    FROM v CROSS JOIN cb)
       |  WHERE rn = 1)""".stripMargin
  }

  /** q_ann_sq8_index replica: the quantizer re-derived from scratch, a
    * full ADC scan over the scalar codes (m = dim one-element
    * subspaces), then the shared top-R + exact re-rank tail. One replay
    * certifies the persisted serve AND the incremental-ingest gate
    * (codes are pure per-vector functions of the frozen min/max);
    * corpusWhere masks the serving corpus for the tombstone-delete
    * variant while the quantizer stats stay those of the build corpus;
    * statsWhere scopes the build corpus for the incremental gate (ranges
    * trained on the standing batch only, serve over everything). */
  def annSqSqlOver(corpusWhere: String, statsWhere: String = ""): String =
    s"""${sqPreludeSql(maxQ = A.maxQueries, levels = A.sqLevels, corpusWhere,
           statsWhere)},
       |pairsrc AS (SELECT q.q_id, v.id FROM q CROSS JOIN v),
       |${adcRankedCtes(m = A.sqDim, subLen = 1, k = A.k, r = A.rerankR)}
       |$pqFinalSelect""".stripMargin

  /** q_ann_ivfsq_index replica — the {IVF, SQ8} matrix cell: the FROZEN
    * coarse centroids bound WHICH codes each query scores
    * (ivfPairsrcCtes — the same frozen-centroid probe replica IVF-PQ
    * uses), while the scalar quantizer is re-derived FROM SCRATCH
    * (sqPreludeSql: per-dim min/max over the full corpus + linear
    * codeword expansion + argmin encode), then the shared ADC +
    * exact-re-rank tail at m = dim. Only the k-means half needs a frozen
    * frame. corpusWhere masks the serving corpus (the delete variant);
    * statsWhere scopes the corpus the SCALAR quantizer trained on (the
    * incremental gate builds its ranges on the standing batch only —
    * the centroid half is frozen from the gate, so it carries its own
    * training scope implicitly). */
  def annIvfSqSqlOver(gate: String, corpusWhere: String,
                      statsWhere: String = ""): String =
    s"""${sqPreludeSql(maxQ = A.maxQueries, levels = A.sqLevels, corpusWhere,
           statsWhere)},
       |${ivfPairsrcCtes(gate)},
       |${adcRankedCtes(m = A.sqDim, subLen = 1, k = A.k, r = A.rerankR)}
       |$pqFinalSelect""".stripMargin

  /** IVF probe CTE chain ending in `pairsrc` (q_id, id): corpus list
    * assignment (argmax cosine, ties -> lowest cent_id: the fused-kernel
    * replica) against the gate's frozen centroids, auto-nProbe =
    * max(1, C//4) probes per query, probed (query, code) pairs. */
  private def ivfPairsrcCtes(gate: String): String =
    s"""cents AS (
       |  SELECT CAST(cent_id AS BIGINT) AS cent_id, cv::DOUBLE[] AS cv,
       |    sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[])) AS cn
       |  FROM ${frozenScan(gate, "centroids")}),
       |assign AS (
       |  SELECT id, cent_id AS list_id FROM (
       |    SELECT v.id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.id ORDER BY
       |        list_dot_product(v.v, c.cv) / (v.nrm * c.cn) DESC, c.cent_id) AS rn
       |    FROM v CROSS JOIN cents c) WHERE rn = 1),
       |np AS (SELECT greatest(1, CAST(count(*) AS BIGINT) // 4) AS eff FROM cents),
       |probes AS (
       |  SELECT q_id, cent_id AS list_id FROM (
       |    SELECT q.q_id, c.cent_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN cents c)
       |  WHERE rn <= (SELECT eff FROM np)),
       |pairsrc AS (
       |  SELECT p.q_id, a.id FROM probes p JOIN assign a ON a.list_id = p.list_id)""".stripMargin

  /** q_ann_ivfpq replica: frozen centroids bound WHICH codes each query
    * scores, then the shared ADC tail over the probed pairs. */
  val annIvfPqSql: String = annIvfPqSqlOver("q_ann_ivfpq", "")

  /** The same IVF-PQ replay against `gate`'s own frozen frames, with an
    * optional corpus predicate on the one `v` CTE every downstream step
    * (encode, list assignment, probe pairing, re-rank) derives from —
    * exactly what tombstone-deleting ids from an IvfPqIndex does to the
    * serve path. The frozen centroids AND codebooks stay those of the
    * FULL corpus the gate trained on (deletion retrains neither
    * quantizer — FAISS remove_ids). Also certifies the persisted-serve
    * and incremental-ingest gates with corpusWhere = "": assignment and
    * code are pure per-vector functions of the frozen quantizer pair, so
    * a loaded or appended index serves exactly what this from-scratch
    * replay derives. */
  def annIvfPqSqlOver(gate: String, corpusWhere: String): String =
    s"""${pqPreludeSql(gate, subLen = A.subLen, maxQ = A.maxQueries,
           corpusWhere = corpusWhere)},
       |${ivfPairsrcCtes(gate)},
       |${adcRankedCtes(m = A.numSubspaces, subLen = A.subLen, k = A.k, r = A.rerankR)}
       |$pqFinalSelect""".stripMargin

  /** Expanded per-subspace squared-L2 distance of the RESIDUAL
    * (v − assigned centroid) to a codeword — replicates the fused
    * kernel's residual encode exactly: rv is computed first (one
    * elementwise subtract), then `d += diff*diff` over the subvector, so
    * each coordinate is the left-associative `(v[i] − cv[i]) − cw[i]`
    * that SQL's `a - b - c` parses to. */
  private def residL2Terms(subLen: Int): String =
    (1 to subLen).map { i =>
      s"(v.v[cb.j*$subLen+$i]-x.cv[cb.j*$subLen+$i]-cb.cw[$i])" +
        s"*(v.v[cb.j*$subLen+$i]-x.cv[cb.j*$subLen+$i]-cb.cw[$i])"
    }.mkString(" + ")

  /** q_ann_ivfpq_residual_index replica — FAISS IndexIVFPQ's DEFAULT
    * by-residual encoding against the gate's frozen quantizer pair. The
    * reconstruction is v̂ = c_list + decode(code), so the ADC terms gain
    * per-list pieces the raw replay doesn't have:
    *   adot = <q, c_list> + Σ_j <q_sub, cw_j>
    *   n2   = |c_list|²  + Σ_j (2·<c_list[sub j], cw_j> + |cw_j|²)
    * Every fold mirrors the executor kernel's ascending-j
    * left-associative order (pivotSum), the encode CTE subtracts the
    * frozen assigned centroid's coordinates before the nearest-codeword
    * argmin ([[residL2Terms]]), and the exact re-rank tail is shared —
    * so the replay is value-exact, not approximate-vs-approximate. */
  def annIvfPqResidualSqlOver(gate: String, corpusWhere: String): String = {
    val corpusPred = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    residualReplayCore(gate,
      s"""v AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings$corpusPred)""".stripMargin)
  }

  /** q_ann_ivfpq_opq_index replica — the FAISS IndexPreTransform
    * composition OPQMatrix → IndexIVFPQ(by_residual): the entire
    * residual replay runs in ROTATED space, so the only change is the
    * corpus CTE — each vector is rotated against the gate's FROZEN
    * rotation frame (out[i] = list_dot_product(rvec_i, v), the exact
    * ascending fold the Scala matVec kernel computes) before the
    * standard encode/assign/probe/ADC/re-rank chain. R is orthogonal,
    * so rotated cosines ARE the original cosines in real arithmetic;
    * value-exactness holds because BOTH sides compute the identical
    * rotated doubles from the identical frozen frame. */
  def annIvfPqOpqSqlOver(gate: String, corpusWhere: String): String = {
    val corpusPred = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    residualReplayCore(gate,
      s"""rot AS (
         |  SELECT CAST(i AS INT) AS i, rvec::DOUBLE[] AS rv
         |  FROM ${frozenScan(gate, "rotation")}),
         |vraw AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v0
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings$corpusPred)),
         |vrot AS (
         |  SELECT vr.id, list(list_dot_product(r.rv, vr.v0) ORDER BY r.i) AS v
         |  FROM vraw vr CROSS JOIN rot r GROUP BY vr.id),
         |v AS (
         |  SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM vrot)""".stripMargin)
  }

  /** q_ann_ivfpq_range replica — FAISS range_search on the residual
    * index: the ENTIRE residual replay up to the ADC scores is shared
    * verbatim (residualReplayCore with a pluggable retention tail, the
    * same cannot-drift pattern as the pluggable corpus CTE); only the
    * retention differs — candidates keep every ADC score >= radius −
    * margin instead of the top-R, and the exact-cosine tail keeps every
    * pair >= radius instead of the top-k, ranked after the filter
    * exactly as the engine ranks. */
  val annIvfPqRangeSql: String = {
    val cut = A.rangeRadius - A.rangeMargin
    residualReplayCore("q_ann_ivfpq_range",
      s"""v AS (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings)""".stripMargin,
      tail = Some(
        s"""cand AS (SELECT q_id, n_id FROM approx WHERE ap >= $cut),
           |rer AS (
           |  SELECT c.q_id, c.n_id,
           |    list_dot_product(q.qv, v.v) / (q.qn * v.nrm) AS cos
           |  FROM cand c JOIN q ON q.q_id = c.q_id JOIN v ON v.id = c.n_id),
           |pqranked AS (
           |  SELECT q_id, n_id, cos,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
           |  FROM rer WHERE cos >= ${A.rangeRadius})
           |$pqFinalSelect""".stripMargin))
  }

  /** The shared residual-ADC replay tail: everything downstream of the
    * corpus CTE (`v` = (id, v, nrm)) — frozen quantizer pair, residual
    * encode, probe selection, per-list ADC cross terms in kernel fold
    * order, exact re-rank. The corpus prelude is pluggable so the raw
    * (annIvfPqResidualSqlOver) and rotated (annIvfPqOpqSqlOver) replays
    * can never drift in their shared arithmetic — and the retention
    * tail is pluggable the same way so the top-k and range serves share
    * every byte of the probe/encode/ADC arithmetic. */
  private def residualReplayCore(gate: String, vPrelude: String,
                                 tail: Option[String] = None): String = {
    val m = A.numSubspaces
    val subLen = A.subLen
    s"""WITH cb AS (
       |  SELECT CAST(subspace AS INT) AS j, CAST(codeword AS INT) AS w,
       |    vec::DOUBLE[] AS cw,
       |    list_dot_product(vec::DOUBLE[], vec::DOUBLE[]) AS cn2
       |  FROM ${frozenScan(gate, "codebooks")}),
       |$vPrelude,
       |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM v WHERE id < ${A.maxQueries}),
       |cents AS (
       |  SELECT CAST(cent_id AS BIGINT) AS cent_id, cv::DOUBLE[] AS cv,
       |    sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[])) AS cn
       |  FROM ${frozenScan(gate, "centroids")}),
       |assign AS (
       |  SELECT id, cent_id AS list_id FROM (
       |    SELECT v.id, c.cent_id,
       |      row_number() OVER (PARTITION BY v.id ORDER BY
       |        list_dot_product(v.v, c.cv) / (v.nrm * c.cn) DESC, c.cent_id) AS rn
       |    FROM v CROSS JOIN cents c) WHERE rn = 1),
       |avx AS (
       |  SELECT a.id, a.list_id, c.cv,
       |    list_dot_product(c.cv, c.cv) AS cl2
       |  FROM assign a JOIN cents c ON c.cent_id = a.list_id),
       |enc AS (
       |  SELECT id, j, cw, cn2, cv FROM (
       |    SELECT v.id, cb.j, cb.w, cb.cw, cb.cn2, x.cv,
       |      row_number() OVER (PARTITION BY v.id, cb.j ORDER BY
       |        ${residL2Terms(subLen)}, cb.w) AS rn
       |    FROM v JOIN avx x ON x.id = v.id CROSS JOIN cb)
       |  WHERE rn = 1),
       |np AS (SELECT greatest(1, CAST(count(*) AS BIGINT) // 4) AS eff FROM cents),
       |probes AS (
       |  SELECT q_id, cent_id AS list_id FROM (
       |    SELECT q.q_id, c.cent_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC, c.cent_id) AS rn
       |    FROM q CROSS JOIN cents c)
       |  WHERE rn <= (SELECT eff FROM np)),
       |pairsrc AS (
       |  SELECT p.q_id, a.id FROM probes p JOIN assign a ON a.list_id = p.list_id),
       |pqt AS (
       |  SELECT p.q_id, p.id, e.j,
       |    list_dot_product(q.qv[e.j*$subLen+1 : e.j*$subLen+$subLen], e.cw) AS t,
       |    2*list_dot_product(e.cv[e.j*$subLen+1 : e.j*$subLen+$subLen], e.cw) + e.cn2 AS u
       |  FROM pairsrc p
       |  JOIN enc e ON e.id = p.id
       |  JOIN q ON q.q_id = p.q_id),
       |ssum AS (
       |  SELECT q_id, id,
       |    ${pivotSum("t", m)} AS adot0,
       |    ${pivotSum("u", m)} AS n20
       |  FROM pqt GROUP BY q_id, id),
       |approx AS (
       |  SELECT s.q_id, s.id AS n_id,
       |    (list_dot_product(q.qv, x.cv) + s.adot0)
       |      / (q.qn * sqrt(x.cl2 + s.n20)) AS ap
       |  FROM ssum s JOIN q ON q.q_id = s.q_id JOIN avx x ON x.id = s.id
       |  WHERE s.id <> s.q_id AND sqrt(x.cl2 + s.n20) > 0),
       |${tail.getOrElse(
           s"""cand AS (
              |  SELECT q_id, n_id FROM (
              |    SELECT q_id, n_id,
              |      row_number() OVER (PARTITION BY q_id ORDER BY ap DESC, n_id) AS r0
              |    FROM approx) WHERE r0 <= ${A.rerankR}),
              |rer AS (
              |  SELECT c.q_id, c.n_id,
              |    list_dot_product(q.qv, v.v) / (q.qn * v.nrm) AS cos
              |  FROM cand c JOIN q ON q.q_id = c.q_id JOIN v ON v.id = c.n_id),
              |pqranked AS (
              |  SELECT q_id, n_id, cos, rank FROM (
              |    SELECT q_id, n_id, cos,
              |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
              |    FROM rer) WHERE rank <= ${A.k})
              |$pqFinalSelect""".stripMargin)}""".stripMargin
  }

  /** q_hybrid_retrieval_pq replica: the q_bm25 pipeline at k=10 (queries
    * doc_id < 4) fused with the IVF-PQ serve pipeline at k=10 (vec_id <
    * 4, this gate's own frozen centroids + codebooks) by the same
    * 1/(60+rank) reciprocal-rank fusion — the production RAG shape where
    * the semantic leg is index-served. Every stage deterministic given
    * the frozen frames -> value-exact. */
  val hybridRetrievalPqSql: String =
    s"""${pqPreludeSql("q_hybrid_retrieval_pq", subLen = A.subLen, maxQ = A.hybridQueries)},
       |${ivfPairsrcCtes("q_hybrid_retrieval_pq")},
       |${adcRankedCtes(m = A.numSubspaces, subLen = A.subLen, k = A.k, r = A.rerankR)},
       |toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> length(x) > 0) AS w
       |  FROM documents),
       |terms AS (SELECT doc_id, unnest(w) AS term FROM toks),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |dlen AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |scal AS (
       |  SELECT (SELECT count(*) FROM documents) AS n_total,
       |    (SELECT count(*) FROM terms) * 1.0
       |      / (SELECT count(*) FROM documents) AS avgdl),
       |qterms AS (
       |  SELECT DISTINCT doc_id AS q_id, term FROM terms
       |  WHERE doc_id < ${A.hybridQueries}),
       |hits AS (
       |  SELECT qt.q_id, tf.doc_id,
       |    ln(1.0 + (s.n_total - d.df + 0.5) / (d.df + 0.5))
       |      * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) AS contrib
       |  FROM tf
       |  JOIN qterms qt USING (term)
       |  JOIN dft d USING (term)
       |  JOIN dlen l ON tf.doc_id = l.doc_id
       |  CROSS JOIN scal s),
       |lscored AS (
       |  SELECT q_id, doc_id, round(sum(contrib), 6) AS score
       |  FROM hits GROUP BY 1, 2),
       |lranked AS (
       |  SELECT q_id, doc_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
       |  FROM lscored),
       |lex AS (SELECT q_id, doc_id, rank FROM lranked WHERE rank <= 10),
       |sem AS (SELECT q_id, n_id AS doc_id, rank FROM pqranked),
       |fused AS (
       |  SELECT coalesce(l.q_id, s.q_id) AS q_id,
       |    coalesce(l.doc_id, s.doc_id) AS doc_id,
       |    l.rank AS lex_rank, s.rank AS sem_rank,
       |    coalesce(1.0 / (60 + l.rank), 0.0)
       |      + coalesce(1.0 / (60 + s.rank), 0.0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
       |final AS (
       |  SELECT q_id, doc_id, lex_rank, sem_rank, rrf,
       |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused)
       |SELECT q_id, rank, doc_id, round(rrf, 6) AS rrf_score, lex_rank, sem_rank
       |FROM final WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  /** q_ann_ivf_kmeans replica: IVF-flat over the frozen k-means centroids
    * — assignment and probes by exact cosine (ties -> lowest cent_id),
    * nProbe=32 of the C=128 lists (25% scan), exact scoring within the
    * probed lists. The whole serve path is deterministic given the
    * frozen centroids. */
  val annIvfKMeansSql: String =
    s"""WITH cents AS (
      |  SELECT CAST(cent_id AS BIGINT) AS cent_id, cv::DOUBLE[] AS cv,
      |    sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[])) AS cn
      |  FROM ${frozenScan("q_ann_ivf_kmeans", "centroids")}),
      |v AS (
      |  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings),
      |q AS (SELECT id AS q_id, v AS qv, nrm AS qn FROM v WHERE id < ${A.maxQueries}),
      |assign AS (
      |  SELECT id, v, nrm, cent_id AS list_id FROM (
      |    SELECT v.id, v.v, v.nrm, c.cent_id,
      |      row_number() OVER (PARTITION BY v.id ORDER BY
      |        list_dot_product(v.v, c.cv) / (v.nrm * c.cn) DESC, c.cent_id) AS rn
      |    FROM v CROSS JOIN cents c) WHERE rn = 1),
      |probes AS (
      |  SELECT q_id, qv, qn, cent_id AS list_id FROM (
      |    SELECT q.q_id, q.qv, q.qn, c.cent_id,
      |      row_number() OVER (PARTITION BY q.q_id ORDER BY
      |        list_dot_product(q.qv, c.cv) / (q.qn * c.cn) DESC, c.cent_id) AS rn
      |    FROM q CROSS JOIN cents c)
      |  WHERE rn <= ${A.kmeansProbes}),
      |scored AS (
      |  SELECT p.q_id, a.id AS n_id,
      |    list_dot_product(p.qv, a.v) / (p.qn * a.nrm) AS cos
      |  FROM probes p JOIN assign a ON a.list_id = p.list_id
      |  WHERE p.q_id <> a.id)
      |SELECT q_id, n_id, rank, round(cos, 6) AS cosine FROM (
      |  SELECT q_id, n_id, cos,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
      |  FROM scored) WHERE rank <= ${A.k}
      |ORDER BY q_id, rank""".stripMargin
}
