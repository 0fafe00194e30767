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
}
