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
    * reason: the same page arrives once per campaign link otherwise).
    * Deliberately NOT in the default list: `ref` — unlike the utm_ keys
    * or gclid it is a generic name that is frequently FUNCTIONAL
    * (`?ref=<branch>`
    * content selectors), so stripping it by default merges genuinely
    * distinct pages; callers whose crawl uses `ref` for attribution pass
    * their own list. Each entry is a regex matched against the param
    * NAME. */
  val DefaultTrackingParams: Seq[String] =
    Seq("utm_[^=]*", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
      "igshid")

  private def trackingRegex(params: Seq[String]): String =
    params.mkString("^(", "|", ")(=.*)?$")

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
    *  6. tracking query params removed ([[DefaultTrackingParams]], or the
    *     caller's own `trackingParams` name-regexes — per-crawl policy
    *     data), the survivors sorted so param order never splits an
    *     identity, empty query dropped entirely.
    *
    * Non-URL junk degrades gracefully: no `scheme://` match → empty
    * scheme/host and the input's text rides through the path term, so
    * distinct junk stays distinct. A null URL canonicalizes to null. */
  def canonicalize(url: Column,
      trackingParams: Seq[String] = DefaultTrackingParams): Column = {
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
      p => p =!= "" && !p.rlike(trackingRegex(trackingParams)))
    val q = array_join(array_sort(kept), "&")
    concat(scheme, when(scheme =!= "", lit("://")).otherwise(lit("")), host,
      path, when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Exact URL-level dedup: keep the minimum-`idCol` document per
    * canonical URL. Adds `url_canonical`. The keep decision shuffles a
    * NARROW (canonical, id) projection only (one map-side-combined min
    * per URL); the wide rows cross the wire once in the final semi-join —
    * the d60 exact-dedup discipline on the URL key.
    *
    * Null/missing URLs (routine in crawl data) are NOT an identity class:
    * each null-URL row is its own key, so every one of them survives
    * untouched with `url_canonical` null — null-rejecting join equality
    * would otherwise silently drop them all. The join key is the two-part
    * struct (url_canonical IS NULL, coalesce(url_canonical, id)), which
    * is collision-free BY CONSTRUCTION: null rows live in their own
    * keyspace half where the second part is the (unique) id, so no
    * adversarial url VALUE — junk canonicalizes to itself verbatim — can
    * ever collide with a null row's key (a sentinel-prefixed string
    * surrogate could: a crawl field equal to the sentinel+id text would
    * silently merge with the null row). */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, idCol: String,
      trackingParams: Seq[String] = DefaultTrackingParams): DataFrame = {
    val withC = df.withColumn("url_canonical",
      canonicalize(col(urlCol), trackingParams))
    val keyed = withC.withColumn("_url_key",
      struct(col("url_canonical").isNull.as("is_null"),
        coalesce(col("url_canonical"), col(idCol).cast("string")).as("k")))
    val keep = keyed.select(col("_url_key"), col(idCol))
      .groupBy("_url_key").agg(min(col(idCol)).as(idCol))
    keyed.join(keep, Seq("_url_key", idCol), "left_semi").drop("_url_key")
  }
}
