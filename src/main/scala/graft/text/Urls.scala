package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.Sampling

/** URL hygiene for crawl curation: parse, canonicalize, and enforce
  * per-domain document caps — the "don't let one site dominate the
  * corpus" rule every web-scale training set applies (C4, Gopher, and
  * RefinedWeb all cap or reweight by host).
  *
  * Parsing rides Spark's codegen'd `parse_url` (HOST/PATH/QUERY); the
  * registrable-domain heuristic (last two dot-labels) is scan-stage
  * string arithmetic. Capping composes
  * [[Sampling.fixedSizePerKeyByThreshold]]: rank documents within a
  * domain by a content-independent md5 of their id and keep the first n —
  * deterministic, partitioning-independent, engine-portable, restartable.
  * The threshold formulation is what makes this 100 TB-shaped: the wide
  * document rows never shuffle — only a narrow (domain, hash) projection
  * does, the per-domain keep/drop boundary joins back as one row per
  * OVER-cap domain (broadcast), and the keep decision runs in the scan
  * stage. Emitting ≤ n rows per domain keeps everything downstream
  * skew-free — the hot-domain case is exactly what the cap is for.
  */
object Urls {

  /** host / path / query / registrable-domain columns from a URL. The
    * `domain` heuristic takes the last two dot-separated labels of the
    * host ("a.b.example.com" → "example.com") — the public-suffix list
    * is policy data a deployment should inject; two labels is the
    * classic approximation. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val host = parse_url(col(urlCol), lit("HOST"))
    df.withColumn("url_host", host)
      .withColumn("url_path", parse_url(col(urlCol), lit("PATH")))
      .withColumn("url_query", parse_url(col(urlCol), lit("QUERY")))
      .withColumn("url_domain",
        when(size(split(host, "\\.")) <= 2, host)
          .otherwise(concat_ws(".",
            element_at(split(host, "\\."), -2),
            element_at(split(host, "\\."), -1))))
  }

  /** Keep at most `n` documents per registrable domain, chosen by the
    * deterministic md5 rank of `idCol`. Adds the url_* columns. */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
      n: Int): DataFrame =
    Sampling.fixedSizePerKeyByThreshold(withUrlParts(df, urlCol), n,
      col("url_domain"), col(idCol))

  /** Query parameters that never change the fetched content — the
    * standard tracking/attribution keys every crawl canonicalizer strips
    * (RefinedWeb's URL dedup normalizes before matching for exactly this
    * reason: the same page arrives once per campaign link otherwise). */
  private val TrackingParam =
    "^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid)(=.*)?$"

  /** Canonical form of a URL for identity comparison (crawl URL-dedup —
    * the RefinedWeb/C4 "same page, many links" collapse). Pure codegen'd
    * string expressions, scan-stage, zero shuffles; the algebra is
    * engine-portable (the oracle replays it in DuckDB):
    *
    *  1. fragment dropped (`#...` never reaches the server);
    *  2. scheme and host lowercased (path/query stay case-sensitive —
    *     they are significant per RFC 3986);
    *  3. leading `www.` dropped from the host;
    *  4. default port stripped (`:80` for http, `:443` for https);
    *  5. trailing `/`s stripped from the path (root path becomes empty);
    *  6. tracking query params removed ([[TrackingParam]]), the
    *     survivors sorted so param order never splits an identity, empty
    *     query dropped entirely.
    *
    * Non-URL junk degrades gracefully: no `scheme://` match → empty
    * scheme/host and the input's text rides through the path term, so
    * distinct junk stays distinct. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostNoWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    // everything after the authority; for junk with no scheme the first
    // regexp fails to match → rest = whole input, preserving distinctness
    val rest = when(scheme =!= "",
        regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1))
      .otherwise(noFrag)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = array_join(array_sort(kept), "&")
    concat(scheme, when(scheme =!= "", lit("://")).otherwise(lit("")), host,
      path, when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Exact URL-level dedup: keep the minimum-`idCol` document per
    * canonical URL. Adds `url_canonical`. The keep decision shuffles a
    * NARROW (canonical, id) projection only (one map-side-combined min
    * per URL); the wide rows cross the wire once in the final semi-join —
    * the d60 exact-dedup discipline on the URL key. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
      idCol: String): DataFrame = {
    val withC = df.withColumn("url_canonical", canonicalize(col(urlCol)))
    val keep = withC.select(col("url_canonical"), col(idCol))
      .groupBy("url_canonical").agg(min(col(idCol)).as(idCol))
    withC.join(keep, Seq("url_canonical", idCol), "left_semi")
  }
}
