package graft

import org.apache.spark.sql.functions._
import graft.api.Lookup
import graft.similarity.Similarity
import graft.sources.Tables

/** Persisted IVF index: the cell-bucketed serving layout answers
  * identically to the in-job ivfTopK path, and a query physically reads
  * only its probed cells' bucket files. */
class IvfIndexSpec extends GraftSpec {

  private val sf = "/root/testdata/sf0.001"

  test("indexed IVF equals the in-job IVF path and seeks only probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    try {
      val centers = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
        "ivf_idx", nlist = 16, seed = 42L, maxIter = 5)
      assert(centers.length == 16)

      val indexed = Similarity.ivfTopKIndexed(spark, "ivf_idx", centers,
        queries, "vec_id", "embedding", k = 5, nprobe = 6)
      val direct = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, seed = 42L, maxIter = 5)
      assert(indexed.orderBy("query_id", "rnk").collect().map(_.toString).toSeq ==
        direct.orderBy("query_id", "rnk").collect().map(_.toString).toSeq)

      // physical seek contract on the index table: a 2-cell probe reads
      // at most 2 of the >= 16 bucket files (in-memory probe side so
      // input_file_name refers only to the index scan)
      import spark.implicits._
      val probe = Seq(0, 1).toDF("qcell")
      val joined = Lookup.lookupJoin(spark, probe, "ivf_idx", "qcell", "cell")
      val touched = joined.select(input_file_name().as("f")).distinct()
        .collect().flatMap(r => Lookup.bucketIdOf(r.getString(0))).toSet
      val expected = Set(0, 1).map(c =>
        Lookup.bucketFor(c, org.apache.spark.sql.types.IntegerType, 16))
      assert(touched.subsetOf(expected), s"touched $touched, expected $expected")
      // the seek reads strictly fewer files than a full index scan would
      // (cells can hash-collide into shared buckets, so files < nlist)
      assert(spark.table("ivf_idx").inputFiles.length > touched.size)
    } finally spark.sql("DROP TABLE IF EXISTS ivf_idx")
  }
}
