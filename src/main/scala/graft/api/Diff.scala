package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the nightly-crawl bookkeeping operator: given
  * two versions of a table, classify every id as added / removed /
  * changed / unchanged. A 100 TB pipeline runs this between crawl
  * snapshots to bound downstream work (only `added`+`changed` re-enter
  * dedup/quality/pack — the incremental shape d93/d104 consume).
  *
  * Shape at scale: each side collapses to (id, 16-hex fingerprint) in its
  * scan stage — the full rows never shuffle — then one full-outer
  * sort-merge join on id. Fingerprints are md5 over the compared columns
  * joined with a \u0001 separator (engine-portable; columns are cast to
  * string, so the diff is value-level, not byte-level).
  */
object Diff {

  /** (id, status, fp_old, fp_new) for every id present in either side;
    * status ∈ added | removed | changed | unchanged. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      fpCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame, out: String): DataFrame =
      df.select(col(idCol).as("id"),
        substring(md5(concat_ws("\u0001", fpCols.map(c => col(c).cast("string")): _*)), 1, 16)
          .as(out))
    fp(oldDf, "fp_old").join(fp(newDf, "fp_new"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")))
  }
}
