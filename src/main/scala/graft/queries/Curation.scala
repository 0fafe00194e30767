package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Diff, Sampling}
import graft.graph.PageRank
import graft.similarity.Similarity
import graft.sources.Tables
import graft.text.Boilerplate

/** Corpus-curation operators: per-source boilerplate removal, weighted
  * sampling without replacement, snapshot diffing, and link-graph
  * PageRank. Every oracle mirrors the full algorithm (md5 fingerprints,
  * hash-uniform draws, the PageRank recurrence) in DuckDB, so the gates
  * prove value-for-value agreement, not just plausible output. */
object Curation extends QueryModule {

  // ---- t127: per-source boilerplate line removal -------------------------
  // The synthetic documents are single-line, so the gate constructs a
  // multi-line corpus with planted boilerplate at three frequencies:
  // NAV + Copyright on 100% of a source's docs (stripped), PROMO on ~52%
  // (stripped at minFrac=0.3), RARE on ~28% (kept). doc_id % 20 decides
  // the source, so the planted frequencies use % 40 / % 80 to vary WITHIN
  // a source. The oracle re-runs the whole algorithm (line split →
  // per-doc-distinct md5 fingerprints → frequency threshold → capped set
  // → scan-stage strip) independently in DuckDB.
  private def builtDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).withColumn("text2", concat(
      lit("NAV home about contact "), col("source"), lit("\n"),
      when(col("doc_id") % 40 < 20,
        concat(lit("PROMO follow "), col("source"), lit(" on social\n")))
        .otherwise(lit("")),
      when(col("doc_id") % 80 < 20,
        concat(lit("RARE banner "), col("source"), lit("\n")))
        .otherwise(lit("")),
      col("text"), lit("\n"),
      lit("Copyright "), col("source"), lit(" all rights reserved")))

  private def t127(s: SparkSession, dir: String): DataFrame =
    Boilerplate.stripBoilerplate(builtDocs(s, dir), "doc_id", "text2",
        "source", minFrac = 0.3, minDocs = 2, maxPerSource = 1000)
      .select(col("doc_id"),
        substring(md5(col("clean_text")), 1, 16).as("clean_fp"),
        length(col("clean_text")).cast("long").as("n_clean"))
      .orderBy("doc_id")

  private val t127Sql =
    """WITH built AS (
      |  SELECT doc_id, source,
      |    'NAV home about contact ' || source || chr(10) ||
      |    CASE WHEN doc_id % 40 < 20
      |         THEN 'PROMO follow ' || source || ' on social' || chr(10) ELSE '' END ||
      |    CASE WHEN doc_id % 80 < 20
      |         THEN 'RARE banner ' || source || chr(10) ELSE '' END ||
      |    text || chr(10) ||
      |    'Copyright ' || source || ' all rights reserved' AS text2
      |  FROM documents),
      |lines AS (
      |  SELECT DISTINCT src, id, substring(md5(l), 1, 16) AS lfp
      |  FROM (SELECT source AS src, doc_id AS id,
      |          unnest(string_split(text2, chr(10))) AS l FROM built)
      |  WHERE trim(l) <> ''),
      |dc AS (SELECT source AS src, count(*) AS n_docs FROM built GROUP BY 1),
      |freq AS (
      |  SELECT lines.src, lfp, count(*) AS n_docs_with, any_value(n_docs) AS n_docs
      |  FROM lines JOIN dc ON lines.src = dc.src GROUP BY 1, 2),
      |bp AS (
      |  SELECT src, lfp FROM (
      |    SELECT src, lfp, row_number() OVER (
      |      PARTITION BY src ORDER BY n_docs_with DESC, lfp) AS rk
      |    FROM freq
      |    WHERE n_docs_with >= 2
      |      AND CAST(n_docs_with AS DOUBLE) >= CAST(0.3 AS DOUBLE) * n_docs)
      |  WHERE rk <= 1000),
      |bset AS (SELECT src, list(lfp) AS bl FROM bp GROUP BY 1),
      |cleaned AS (
      |  SELECT doc_id, array_to_string(list_filter(string_split(text2, chr(10)),
      |    x -> NOT coalesce(list_contains(bl, substring(md5(x), 1, 16)), FALSE)),
      |    chr(10)) AS clean
      |  FROM built LEFT JOIN bset ON built.source = bset.src)
      |SELECT doc_id, substring(md5(clean), 1, 16) AS clean_fp,
      |  length(clean) AS n_clean
      |FROM cleaned ORDER BY doc_id""".stripMargin

  // ---- t128: weighted sampling without replacement (Efraimidis–Spirakis)
  // 5 docs per source, weight = n_chars; the deterministic hash-uniform
  // (md5 52-bit prefix) and the exponential rank -ln(u)/w are reproduced
  // closed-form in DuckDB, so the SELECTED ids must agree exactly.
  private def t128(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedFixedSizePerKey(Tables.documents(s, dir), 5,
        col("source"), col("doc_id"), col("n_chars"))
      .select(col("source"), col("doc_id"))
      .orderBy("source", "doc_id")

  private val t128Sql =
    """WITH r AS (
      |  SELECT source, doc_id,
      |    -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
      |         + CAST(0.5 AS DOUBLE)) / CAST(4503599627370496 AS DOUBLE))
      |      / CAST(n_chars AS DOUBLE) AS rk
      |  FROM documents),
      |s AS (SELECT source, doc_id,
      |        row_number() OVER (PARTITION BY source ORDER BY rk, doc_id) AS rn
      |      FROM r)
      |SELECT source, doc_id FROM s WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin

  // ---- p129: corpus snapshot diff ---------------------------------------
  // new = old minus ids %17=0, text of %13=0 modified, %19=0 re-added
  // under shifted ids — constructed identically on both sides; the diff
  // must classify every id added/removed/changed/unchanged with matching
  // fingerprints.
  private def p129(s: SparkSession, dir: String): DataFrame = {
    val old = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val nw = old.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text", when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .unionByName(old.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("new "), col("text")).as("text")))
    Diff.snapshotDiff(old, nw, "doc_id", Seq("text"))
      .select(col("id"), col("status"), col("fp_old"), col("fp_new"))
      .orderBy("id")
  }

  private val p129Sql =
    """WITH old AS (SELECT doc_id, text FROM documents),
      |nw AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM old WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'new ' || text FROM old WHERE doc_id % 19 = 0),
      |o AS (SELECT doc_id, substring(md5(text), 1, 16) AS fp_old FROM old),
      |n AS (SELECT doc_id, substring(md5(text), 1, 16) AS fp_new FROM nw)
      |SELECT coalesce(o.doc_id, n.doc_id) AS id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN fp_old <> fp_new THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  fp_old, fp_new
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |ORDER BY id""".stripMargin

  // ---- p130: link-graph PageRank ----------------------------------------
  // Graph: customer → supplier edges from the order lines (distinct
  // pairs; suppliers offset by 1e6 into a shared id space). 5 power
  // iterations at d=0.85; the oracle unrolls the identical recurrence
  // with a recursive CTE. Ranks rounded to 7 decimals on both sides to
  // absorb summation-order ulps.
  private def p130(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      .distinct()
    val nodes = Tables.customer(s, dir).select(col("c_custkey").as("node"))
      .union(Tables.supplier(s, dir).select((col("s_suppkey") + 1000000L).as("node")))
      .distinct()
    PageRank.run(edges, nodes, iters = 5, d = 0.85)
      .select(col("node"), round(col("rank"), 7).as("rank"))
      .orderBy("node")
  }

  private val p130Sql =
    """WITH RECURSIVE nodes AS (
      |  SELECT c_custkey AS node FROM customer
      |  UNION
      |  SELECT s_suppkey + 1000000 FROM supplier),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |e AS (SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY 1),
      |we AS (
      |  SELECT e.src, e.dst, CAST(1 AS DOUBLE) / odeg AS w
      |  FROM e JOIN od ON e.src = od.src
      |  UNION ALL
      |  SELECT node, node, CAST(0 AS DOUBLE) FROM nodes),
      |pr AS (
      |  SELECT 0 AS it, node, (SELECT CAST(1 AS DOUBLE) / n FROM nn) AS rank
      |  FROM nodes
      |  UNION ALL
      |  SELECT pr.it + 1, we.dst AS node,
      |    (SELECT (1 - CAST(0.85 AS DOUBLE)) / n FROM nn)
      |      + CAST(0.85 AS DOUBLE) * sum(pr.rank * we.w) AS rank
      |  FROM pr JOIN we ON pr.node = we.src
      |  WHERE pr.it < 5
      |  GROUP BY pr.it + 1, we.dst)
      |SELECT node, round(rank, 7) AS rank FROM pr WHERE it = 5
      |ORDER BY node""".stripMargin

  // ---- d131: Johnson–Lindenstrauss random projection --------------------
  // 64-dim embeddings → 16 dims through the deterministic md5-sign matrix;
  // the oracle rebuilds every matrix entry and the fold closed-form in
  // DuckDB, so all 16 projected components match value-for-value (round 4
  // absorbs summation-order ulps).
  // Gate output is exploded to one (vec_id, idx, pv) row per projected
  // component: the driver's pandas comparator sorts column values and
  // cannot hash array cells (r6 finding), so no gate may emit arrays.
  private def d131(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProject(Tables.embeddings(s, dir), "embedding", 16,
        seed = 42L)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("idx", "v")))
      .select(col("vec_id"), col("idx").cast("long").as("idx"),
        // + 0.0 canonicalizes IEEE -0.0 → 0.0 (DuckDB rounds tiny
        // negatives to -0.0, Spark to 0.0; the driver hash is bit-exact)
        (round(col("v"), 4) + lit(0.0)).as("pv"))
      .orderBy("vec_id", "idx")

  private val d131Sql =
    """SELECT vec_id, CAST(j - 1 AS BIGINT) AS idx,
      |  round(list_sum(list_transform(generate_series(1, 64), i ->
      |    embedding[i]::DOUBLE *
      |    (CASE WHEN substring(md5('42_' || (i-1) || '_' || (j-1)), 1, 1) < '8'
      |          THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)))
      |    / sqrt(CAST(16 AS DOUBLE)), 4) + 0.0 AS pv
      |FROM embeddings CROSS JOIN generate_series(1, 16) AS t(j)
      |ORDER BY vec_id, idx""".stripMargin

  // ---- d132: containment (asymmetric Jaccard) probe ---------------------
  // Probe text = doc 1 ++ doc 2: both must surface with containment ≈ 1
  // (subset duplication that symmetric Jaccard misses — the probe's union
  // dominates). Shingle hashing is injective on the corpus, so containment
  // over hashes equals containment over the raw 5-gram sets the oracle
  // builds.
  private def d132(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.charShingleHashes
    val d = Tables.documents(s, dir)
    val probe = d.filter(col("doc_id").isin(1, 2))
      .agg(concat_ws(" ",
        max(when(col("doc_id") === 1, col("text"))),
        max(when(col("doc_id") === 2, col("text")))).as("ptext"))
      .select(charShingleHashes(col("ptext"), 5).as("probe_sh"))
    d.select(col("doc_id"), charShingleHashes(col("text"), 5).as("sh"))
      .crossJoin(broadcast(probe))
      .withColumn("c", graft.dedup.Dedup.containment(col("sh"), col("probe_sh")))
      .filter(col("c") >= 0.8)
      .select(col("doc_id"), round(col("c"), 6).as("c"))
      .orderBy("doc_id")
  }

  private val d132Sql =
    """WITH d AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) t
      |           FROM documents),
      |p AS (SELECT lower(trim(regexp_replace(
      |        (SELECT text FROM documents WHERE doc_id = 1) || ' ' ||
      |        (SELECT text FROM documents WHERE doc_id = 2), '\s+', ' ', 'g'))) t),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         generate_series(1, greatest(len(t) - 4, 1)), i -> t[i:i+4])) s
      |       FROM d),
      |psh AS (SELECT list_distinct(list_transform(
      |         generate_series(1, greatest(len(t) - 4, 1)), i -> t[i:i+4])) ps
      |        FROM p)
      |SELECT doc_id, round(len(list_intersect(s, ps))::DOUBLE / len(s), 6) AS c
      |FROM sh, psh
      |WHERE len(list_intersect(s, ps))::DOUBLE / len(s) >= 0.8
      |ORDER BY doc_id""".stripMargin

  // ---- d142: CDC changelog apply (last-writer-wins upsert/delete) -------
  // A synthetic monotone changelog over the documents snapshot: inserts
  // (new keys), updates, deletes, and a later second update that must win
  // over the delete (key % 35: U@2, D@3, U@4 → resurrected). The oracle
  // replays the same changelog in DuckDB with QUALIFY row_number. Output
  // is (doc_id, 16-hex md5 of the row text) so the compare is value-exact
  // without shipping full documents.
  private def d142(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(s, dir).select("doc_id", "text")
    val ins = snap.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("ingested "), col("doc_id").cast("string")).as("text"),
        lit(1L).as("seq"), lit("I").as("op"))
    val upd = snap.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), upper(substring(col("text"), 1, 40)).as("text"),
        lit(2L).as("seq"), lit("U").as("op"))
    val del = snap.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), lit("").as("text"),
        lit(3L).as("seq"), lit("D").as("op"))
    val res = snap.filter(col("doc_id") % 35 === 0)
      .select(col("doc_id"), lit("resurrected").as("text"),
        lit(4L).as("seq"), lit("U").as("op"))
    val changes = ins.unionByName(upd).unionByName(del).unionByName(res)
    graft.api.Cdc.applyChangelog(snap, changes, Seq("doc_id"), "seq", "op")
      .select(col("doc_id"), substring(md5(col("text")), 1, 16).as("fp"))
      .orderBy("doc_id")
  }

  private val d142Sql =
    """WITH snap AS (SELECT doc_id, text FROM documents),
      |ch AS (
      |  SELECT doc_id + 1000000 AS doc_id, 'ingested ' || doc_id AS text,
      |         1 AS seq, 'I' AS op FROM snap WHERE doc_id % 13 = 0
      |  UNION ALL
      |  SELECT doc_id, upper(substring(text, 1, 40)), 2, 'U'
      |  FROM snap WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id, '', 3, 'D' FROM snap WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id, 'resurrected', 4, 'U' FROM snap WHERE doc_id % 35 = 0),
      |latest AS (
      |  SELECT doc_id, text, op FROM ch
      |  QUALIFY row_number() OVER (PARTITION BY doc_id
      |                             ORDER BY seq DESC, op DESC) = 1),
      |applied AS (
      |  SELECT s.doc_id, s.text FROM snap s
      |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.doc_id = s.doc_id)
      |  UNION ALL
      |  SELECT doc_id, text FROM latest WHERE op <> 'D')
      |SELECT doc_id, substring(md5(text), 1, 16) AS fp
      |FROM applied ORDER BY doc_id""".stripMargin

  // ---- t149: URL canonicalization + URL-level dedup ----------------------
  // Deterministic messy URLs over the documents table: five variants per
  // id-group of 5 — {scheme/host case + www + :80 + trailing slash,
  // fragment} collapse to one http canonical, {www + :443 + tracking
  // params + param order} to one https canonical, and a unique tail —
  // PLUS the two crawl-reality arms layered on top by id mod 7: NULL urls
  // (every one must survive, one each, with url_canonical NULL — the
  // silent-loss class the r10 fix closed) and non-URL junk (canonicalizes
  // to itself verbatim; equal junk collapses like any other identity,
  // colliding by id mod 100 here). The oracle replays the ENTIRE
  // canonicalization algebra (fragment, case, www, default port, trailing
  // slash, tracking filter, param sort, junk/null degradation)
  // independently in DuckDB, then takes min(doc_id) per canonical with
  // null rows passed through ungrouped. Ref: the reference's own url
  // normalization lives app-side; this is the RefinedWeb-style crawl
  // dedup stage.
  private def t149Messy(s: SparkSession, dir: String): DataFrame = {
    val n = floor(col("doc_id") / 5).cast("long").cast("string")
    val v = col("doc_id") % 5
    val w = col("doc_id") % 7
    Tables.documents(s, dir).withColumn("url",
      when(w === 6, lit(null).cast("string"))
      .when(w === 3, concat(lit("not a url "),
        (col("doc_id") % 100).cast("string")))
      .when(v === 0, concat(lit("HTTP://WWW.Site"), n, lit(".COM:80/Articles/"),
        n, lit("/")))
      .when(v === 1, concat(lit("http://site"), n, lit(".com/Articles/"), n,
        lit("#section-2")))
      .when(v === 2, concat(lit("https://www.site"), n, lit(".com:443/Articles/"),
        n, lit("?utm_source=feed&b=2&a=1")))
      .when(v === 3, concat(lit("https://site"), n, lit(".com/Articles/"), n,
        lit("?a=1&utm_campaign=x&b=2&fbclid=abc")))
      .otherwise(concat(lit("https://site"), n, lit(".com/unique/"),
        col("doc_id").cast("string"))))
  }

  private def t149(s: SparkSession, dir: String): DataFrame =
    graft.text.Urls.dedupByCanonicalUrl(t149Messy(s, dir), "url", "doc_id")
      .select(col("doc_id"), col("url_canonical"))
      .orderBy("doc_id")

  private val t149Sql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 6 THEN NULL
      |         WHEN doc_id % 7 = 3 THEN 'not a url ' || (doc_id % 100)
      |    ELSE CASE doc_id % 5
      |      WHEN 0 THEN 'HTTP://WWW.Site' || (doc_id // 5) || '.COM:80/Articles/' || (doc_id // 5) || '/'
      |      WHEN 1 THEN 'http://site' || (doc_id // 5) || '.com/Articles/' || (doc_id // 5) || '#section-2'
      |      WHEN 2 THEN 'https://www.site' || (doc_id // 5) || '.com:443/Articles/' || (doc_id // 5) || '?utm_source=feed&b=2&a=1'
      |      WHEN 3 THEN 'https://site' || (doc_id // 5) || '.com/Articles/' || (doc_id // 5) || '?a=1&utm_campaign=x&b=2&fbclid=abc'
      |      ELSE 'https://site' || (doc_id // 5) || '.com/unique/' || doc_id
      |    END END AS url
      |  FROM documents),
      |p0 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM m),
      |p AS (
      |  SELECT doc_id, nofrag,
      |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '') AS h0
      |  FROM p0),
      |p2 AS (
      |  SELECT doc_id, scheme, h0,
      |    CASE WHEN scheme <> '' THEN
      |      regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
      |    ELSE nofrag END AS rest
      |  FROM p),
      |h AS (
      |  SELECT doc_id, scheme,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(h0, ':80$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(h0, ':443$', '')
      |         ELSE h0 END AS host,
      |    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
      |    array_to_string(list_sort(list_filter(
      |      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)(=.*)?$'))), '&') AS q
      |  FROM p2),
      |canon AS (
      |  SELECT doc_id,
      |    CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END
      |      || host || path ||
      |    CASE WHEN q <> '' THEN '?' || q ELSE '' END AS url_canonical
      |  FROM h)
      |SELECT min(doc_id) AS doc_id, url_canonical
      |FROM canon WHERE url_canonical IS NOT NULL GROUP BY url_canonical
      |UNION ALL
      |SELECT doc_id, url_canonical FROM canon WHERE url_canonical IS NULL
      |ORDER BY doc_id""".stripMargin

  // ---- p150: ranked-retrieval quality metrics (recall/MRR/nDCG@10) ------
  // The run is a REAL pass through the similarity stack (exact cosine
  // top-10, the d64-green ranking discipline: sim rounded to 4, ties by
  // id); qrels derive from the embeddings table's own cluster labels —
  // same-label documents are relevant, graded 2 when vec_id % 3 = 0 else
  // 1. The oracle recomputes the run (d64's CTE), the qrels, and every
  // metric definition (gain 2^g−1, log2 discounts, ideal ranking with
  // deterministic tie-break) independently in DuckDB.
  private def p150(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val run0 = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("nn_id").as("doc_id"), col("rnk").as("rank"))
    // Malformed-input arm (the r10 uniqueness-contract fix, oracle-gated):
    // query 0's whole run re-appears at WORSE in-window ranks and query
    // 1's whole qrels re-appears at grade 1. evaluate's enforced collapse
    // (min rank / max grade per (query, doc)) must restore the clean
    // fixture exactly — without it, recall/precision double-count and
    // n_relevant inflates. The oracle applies the same collapse on the
    // same duplicated inputs, independently.
    val run = run0.unionByName(run0.filter(col("query_id") === 0)
      .withColumn("rank", least(col("rank") + 3, lit(10))))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("label").as("ql"))
    val qrels0 = emb.select(col("vec_id").as("doc_id"), col("label"))
      .join(q, col("label") === col("ql") && col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        when(col("doc_id") % 3 === 0, 2.0).otherwise(1.0).as("grade"))
    val qrels = qrels0.unionByName(qrels0.filter(col("query_id") === 1)
      .withColumn("grade", lit(1.0)))
    graft.similarity.RetrievalMetrics.evaluate(run, qrels, k = 10)
      .select(col("query_id"), col("n_relevant"),
        round(col("recall_at_k"), 6).as("recall_at_k"),
        round(col("precision_at_k"), 6).as("precision_at_k"),
        round(col("mrr_at_k"), 6).as("mrr_at_k"),
        round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
      .orderBy("query_id")
  }

  private val p150Sql =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
      |           FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS doc_id,
      |    round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 4) AS sim
      |  FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      |run0 AS (
      |  SELECT query_id, doc_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rnk
      |  FROM scored QUALIFY rnk <= 10),
      |run AS (  -- duplicated query-0 rows collapse back to min(rank)
      |  SELECT query_id, doc_id, min(rnk) AS rnk FROM (
      |    SELECT * FROM run0
      |    UNION ALL
      |    SELECT query_id, doc_id, least(rnk + 3, 10) AS rnk
      |    FROM run0 WHERE query_id = 0)
      |  GROUP BY query_id, doc_id),
      |qrels0 AS (
      |  SELECT q.query_id, e.vec_id AS doc_id,
      |    CASE WHEN e.vec_id % 3 = 0 THEN 2.0 ELSE 1.0 END AS grade
      |  FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.query_id),
      |qrels AS (  -- duplicated query-1 judgments collapse back to max(grade)
      |  SELECT query_id, doc_id, max(grade) AS grade FROM (
      |    SELECT * FROM qrels0
      |    UNION ALL
      |    SELECT query_id, doc_id, 1.0 AS grade FROM qrels0 WHERE query_id = 1)
      |  GROUP BY query_id, doc_id),
      |ideal AS (
      |  SELECT query_id, count(*) AS n_relevant,
      |    sum(CASE WHEN irank <= 10
      |             THEN (pow(2.0, grade) - 1) / log2(irank + 1) END) AS idcg
      |  FROM (SELECT query_id, grade,
      |          row_number() OVER (PARTITION BY query_id
      |                             ORDER BY grade DESC, doc_id) AS irank
      |        FROM qrels)
      |  GROUP BY query_id),
      |j AS (
      |  SELECT r.query_id, r.rnk, coalesce(g.grade, 0.0) AS grade
      |  FROM run r LEFT JOIN qrels g
      |    ON g.query_id = r.query_id AND g.doc_id = r.doc_id),
      |perq AS (
      |  SELECT query_id,
      |    sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
      |    min(CASE WHEN grade > 0 THEN rnk END) AS first_rel,
      |    sum((pow(2.0, grade) - 1) / log2(rnk + 1)) AS dcg
      |  FROM j GROUP BY query_id)
      |SELECT i.query_id, CAST(i.n_relevant AS BIGINT) AS n_relevant,
      |  round(coalesce(p.hits, 0) * 1.0 / i.n_relevant, 6) AS recall_at_k,
      |  round(coalesce(p.hits, 0) / 10.0, 6) AS precision_at_k,
      |  round(coalesce(1.0 / p.first_rel, 0.0), 6) AS mrr_at_k,
      |  round(coalesce(p.dcg / i.idcg, 0.0), 6) AS ndcg_at_k
      |FROM ideal i LEFT JOIN perq p ON p.query_id = i.query_id
      |ORDER BY i.query_id""".stripMargin

  override def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t149_url_canonical_dedup" -> (t149 _),
    "p150_retrieval_metrics" -> (p150 _),
    "t127_boilerplate_strip" -> (t127 _),
    "t128_weighted_sample" -> (t128 _),
    "p129_snapshot_diff" -> (p129 _),
    "p130_pagerank" -> (p130 _),
    "d131_jl_project" -> (d131 _),
    "d132_containment_probe" -> (d132 _),
    "d142_cdc_apply" -> (d142 _))

  override def oracles: Map[String, String] = Map(
    "t149_url_canonical_dedup" -> t149Sql,
    "p150_retrieval_metrics" -> p150Sql,
    "t127_boilerplate_strip" -> t127Sql,
    "t128_weighted_sample" -> t128Sql,
    "p129_snapshot_diff" -> p129Sql,
    "p130_pagerank" -> p130Sql,
    "d131_jl_project" -> d131Sql,
    "d132_containment_probe" -> d132Sql,
    "d142_cdc_apply" -> d142Sql)
}
