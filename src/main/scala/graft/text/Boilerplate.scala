package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source boilerplate line removal (CCNet / crawl-curation shape:
  * navigation bars, cookie banners, copyright footers repeat on nearly
  * every page of a site — reference users run this ahead of dedup and
  * quality filtering; see also sdks/java/.../transforms/ for the ParDo
  * substrate the reference would express it on).
  *
  * A line is boilerplate within a source when it appears in at least
  * `minDocs` distinct documents AND in at least `minFrac` of the source's
  * documents. 100 TB shape: only (source, 16-hex line fingerprint, doc id)
  * triples ever shuffle — two compact exchanges (per-doc distinct + the
  * frequency count) — and the document TEXT never shuffles at all: the
  * per-source boilerplate set is capped (`maxPerSource`, most-frequent
  * first) and joined back broadcast, so the strip itself is a scan-stage
  * higher-order-function filter over the split lines.
  *
  * Fingerprints are md5 prefixes (engine-portable, same convention as
  * [[graft.dedup.Dedup.exact]]) so an independent engine reproduces the
  * exact same keep/strip decisions. Whitespace-only lines are never
  * candidates (stripping them would collapse paragraph structure).
  */
object Boilerplate {

  private def lineFp(c: Column): Column = substring(md5(c), 1, 16)

  /** The capped per-source boilerplate line-fingerprint table:
    * (src, lfp, n_docs_with, n_docs). Deterministic: the cap takes the
    * most frequent lines first, ties by fingerprint. */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, minFrac: Double = 0.3, minDocs: Int = 2,
      maxPerSource: Int = 1000): DataFrame = {
    val lines = docs
      .select(col(srcCol).as("src"), col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(trim(col("line")) =!= "")
      .select(col("src"), col("id"), lineFp(col("line")).as("lfp"))
      .distinct() // count each line once per document
    // one row per source — broadcasts
    val docCounts = docs.groupBy(col(srcCol).as("src"))
      .agg(count(lit(1)).as("n_docs"))
    lines.groupBy("src", "lfp").agg(count(lit(1)).as("n_docs_with"))
      .join(broadcast(docCounts), "src")
      .filter(col("n_docs_with") >= minDocs &&
        col("n_docs_with").cast("double") >= lit(minFrac) * col("n_docs"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("src").orderBy(col("n_docs_with").desc, col("lfp"))))
      .filter(col("__rk") <= maxPerSource)
      .drop("__rk")
  }

  /** `docs` with `textCol` replaced (in a new `cleanCol`) by the text with
    * that source's boilerplate lines removed. All original columns are
    * kept. */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, cleanCol: String = "clean_text",
      minFrac: Double = 0.3, minDocs: Int = 2,
      maxPerSource: Int = 1000): DataFrame = {
    val bp = boilerplateLines(docs, idCol, textCol, srcCol, minFrac, minDocs,
        maxPerSource)
      .groupBy("src").agg(collect_set(col("lfp")).as("__bset"))
    docs.join(broadcast(bp), docs(srcCol) === bp("src"), "left")
      .withColumn(cleanCol,
        array_join(
          filter(split(col(textCol), "\n"),
            l => !coalesce(array_contains(col("__bset"), lineFp(l)), lit(false))),
          "\n"))
      // drop ONLY the joined helper columns via the bp reference: a
      // name-based drop("src") would also silently remove a caller column
      // that happens to be named "src" (the doc promises all original
      // columns are kept)
      .drop(bp("src")).drop(bp("__bset"))
  }
}
