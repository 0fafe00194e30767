package graft

import org.apache.spark.sql.functions._
import graft.api.Lookup
import graft.text.Bm25

/** Persisted BM25 inverted index: the term-bucketed serving layout
  * answers exactly what the in-job corpus scan answers, appends fold
  * increments with correct df/N/avgdl bookkeeping, and a query physically
  * reads only its own terms' bucket files. */
class Bm25IndexSpec extends GraftSpec {
  import spark.implicits._

  private def corpusA = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox"),
    (2L, "brown bears eat honey near the river"),
    (3L, "a lazy afternoon by the quiet river"),
    (4L, "dogs and foxes are distant cousins"),
    (5L, "the river runs quick and brown")).toDF("doc_id", "text")

  private def corpusB = Seq(
    (6L, "quick thinking saves the lazy dog"),
    (7L, "honey and rivers and foxes")).toDF("doc_id", "text")

  private def queries = Seq(
    (0L, "quick fox"), (1L, "brown river"), (2L, "lazy dog honey"))
    .toDF("qid", "qt")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rnk").collect().map(_.toString).toSeq

  private def dropAll(t: String): Unit =
    Seq(t, s"${t}_stats", s"${t}_stats_tmp", s"${t}_meta")
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("indexed topK answers exactly the in-job topK answer") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_idx", buckets = 8)
      val indexed = Bm25.topKIndexed(spark, "bm25_idx", queries, "qid", "qt", k = 4)
      val direct = Bm25.topK(corpusA, "doc_id", "text", queries, "qid", "qt", k = 4)
      assert(rows(indexed) == rows(direct))
      assert(rows(indexed).nonEmpty)
    } finally dropAll("bm25_idx")
  }

  test("append ≡ rebuild ≡ in-job on the unioned corpus; bookkeeping exact") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_app", buckets = 8)
      Bm25.appendToIndex(spark, "bm25_app", corpusB, "doc_id", "text")
      Bm25.buildIndex(corpusA.unionByName(corpusB), "doc_id", "text",
        "bm25_full", buckets = 8)
      val union = corpusA.unionByName(corpusB)
      val appended = Bm25.topKIndexed(spark, "bm25_app", queries, "qid", "qt", k = 5)
      val rebuilt = Bm25.topKIndexed(spark, "bm25_full", queries, "qid", "qt", k = 5)
      val direct = Bm25.topK(union, "doc_id", "text", queries, "qid", "qt", k = 5)
      assert(rows(appended) == rows(rebuilt))
      assert(rows(appended) == rows(direct))

      // bookkeeping: stats and meta after the append equal the full build's
      val stA = spark.table("bm25_app_stats").as[(String, Long)].collect().toSet
      val stF = spark.table("bm25_full_stats").as[(String, Long)].collect().toSet
      assert(stA == stF)
      val mA = spark.table("bm25_app_meta").head()
      val mF = spark.table("bm25_full_meta").head()
      assert(mA.getLong(0) == mF.getLong(0) && mA.getDouble(1) == mF.getDouble(1))
    } finally { dropAll("bm25_app"); dropAll("bm25_full") }
  }

  test("query seeks only its own terms' bucket files") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_seek", buckets = 8)
      val probe = Seq("fox", "river").toDF("pterm")
      val joined = Lookup.lookupJoin(spark, probe, "bm25_seek", "pterm", "term")
      val touched = joined.select(input_file_name().as("f")).distinct()
        .collect().flatMap(r => Lookup.bucketIdOf(r.getString(0))).toSet
      val expected = Set("fox", "river").map(t =>
        Lookup.bucketFor(t, org.apache.spark.sql.types.StringType, 8))
      assert(touched.subsetOf(expected), s"touched $touched, expected $expected")
    } finally dropAll("bm25_seek")
  }

  test("append repairs a crash-stranded stats/meta swap on entry") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_crash", buckets = 8)
      // simulate the worst swap crash: stats renamed aside, nothing
      // renamed in — no live stats table, only the recoverable _old
      spark.sql("ALTER TABLE bm25_crash_stats RENAME TO bm25_crash_stats_old")
      spark.sql("ALTER TABLE bm25_crash_meta RENAME TO bm25_crash_meta_old")
      Bm25.appendToIndex(spark, "bm25_crash", corpusB, "doc_id", "text")
      val direct = Bm25.topK(corpusA.unionByName(corpusB), "doc_id", "text",
        queries, "qid", "qt", k = 5)
      val indexed = Bm25.topKIndexed(spark, "bm25_crash", queries, "qid", "qt", k = 5)
      assert(rows(indexed) == rows(direct))
      // no strandings left behind
      assert(!spark.catalog.tableExists("bm25_crash_stats_old"))
      assert(!spark.catalog.tableExists("bm25_crash_meta_old"))
      assert(!spark.catalog.tableExists("bm25_crash_stats_tmp"))
      assert(!spark.catalog.tableExists("bm25_crash_meta_tmp"))
    } finally {
      dropAll("bm25_crash")
      Seq("bm25_crash_stats_old", "bm25_crash_meta_old", "bm25_crash_meta_tmp")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    }
  }

  test("repairStatsFromPostings recovers the postings-committed crash") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_pc", buckets = 8)
      // forge appendToIndex's ONE non-idempotent window: the increment's
      // postings committed (the identical bucketed append the real path
      // writes), but the process died before the stats/meta swaps — the
      // side tables still describe corpus A only
      Bm25.postings(corpusB, "doc_id", "text")
        .repartition(col("term"))
        .write.mode("append").bucketBy(8, "term").sortBy("term")
        .format("parquet").saveAsTable("bm25_pc")
      // the recovery: recompute stats/meta from the postings themselves
      Bm25.repairStatsFromPostings(spark, "bm25_pc")
      val union = corpusA.unionByName(corpusB)
      val indexed = Bm25.topKIndexed(spark, "bm25_pc", queries, "qid", "qt", k = 5)
      val direct = Bm25.topK(union, "doc_id", "text", queries, "qid", "qt", k = 5)
      assert(rows(indexed) == rows(direct))
      // bookkeeping equals a fresh build's over the same corpus
      Bm25.buildIndex(union, "doc_id", "text", "bm25_pcf", buckets = 8)
      val stR = spark.table("bm25_pc_stats").as[(String, Long)].collect().toSet
      val stF = spark.table("bm25_pcf_stats").as[(String, Long)].collect().toSet
      assert(stR == stF)
      val mR = spark.table("bm25_pc_meta").head()
      val mF = spark.table("bm25_pcf_meta").head()
      assert(mR.getLong(0) == mF.getLong(0) && mR.getDouble(1) == mF.getDouble(1))
      assert(mR.getInt(2) == 8) // bucket count survives the repair
      // idempotent: a second repair changes nothing and leaves no strandings
      Bm25.repairStatsFromPostings(spark, "bm25_pc")
      assert(rows(Bm25.topKIndexed(spark, "bm25_pc", queries, "qid", "qt", k = 5))
        == rows(direct))
      assert(!spark.catalog.tableExists("bm25_pc_stats_old"))
      assert(!spark.catalog.tableExists("bm25_pc_stats_tmp"))
      assert(!spark.catalog.tableExists("bm25_pc_meta_old"))
      assert(!spark.catalog.tableExists("bm25_pc_meta_tmp"))
      // and it also absorbs the half-swap crash (stats stranded as _old)
      spark.sql("ALTER TABLE bm25_pc_stats RENAME TO bm25_pc_stats_old")
      Bm25.repairStatsFromPostings(spark, "bm25_pc")
      assert(rows(Bm25.topKIndexed(spark, "bm25_pc", queries, "qid", "qt", k = 5))
        == rows(direct))
    } finally {
      dropAll("bm25_pc"); dropAll("bm25_pcf")
      Seq("bm25_pc_stats_old", "bm25_pc_meta_old", "bm25_pc_meta_tmp")
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    }
  }

  test("dropIndexTable resolves db-qualified locations from the catalog") {
    spark.sql("CREATE DATABASE IF NOT EXISTS bm25db")
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25db.qidx", buckets = 4)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier("bm25db.qidx"))
          .location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(loc))
      Bm25.dropIndexTable(spark, "bm25db.qidx")
      assert(!spark.catalog.tableExists("bm25db.qidx"))
      assert(!fs.exists(loc), s"stale location survives at $loc")
      // rebuild at the same name must not die with LOCATION_ALREADY_EXISTS
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25db.qidx", buckets = 4)
      assert(spark.catalog.tableExists("bm25db.qidx"))
    } finally {
      Seq("bm25db.qidx", "bm25db.qidx_stats", "bm25db.qidx_meta")
        .foreach(n => Bm25.dropIndexTable(spark, n))
      spark.sql("DROP DATABASE IF EXISTS bm25db CASCADE")
    }
  }

  test("empty query vocabulary and unindexed terms degrade to empty") {
    try {
      Bm25.buildIndex(corpusA, "doc_id", "text", "bm25_empty", buckets = 4)
      val noTerms = Seq((0L, " ")).toDF("qid", "qt")
      assert(Bm25.topKIndexed(spark, "bm25_empty", noTerms.limit(0),
        "qid", "qt", k = 3).count() == 0)
      val alien = Seq((0L, "zzz qqq")).toDF("qid", "qt")
      assert(Bm25.topKIndexed(spark, "bm25_empty", alien,
        "qid", "qt", k = 3).count() == 0)
    } finally dropAll("bm25_empty")
  }
}
