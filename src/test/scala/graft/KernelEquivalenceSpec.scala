package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** r11 optimization round: the hot-path kernels that replaced declarative
  * formulations must stay BIT-IDENTICAL to what they replaced — the
  * correctness gates hash results, so "close" is a regression. Pins:
  *   - bruteForceTopK's partition kernel ≡ the crossJoin + rankTopK form
  *     (same rounding, same tie-breaks, rounded ties included);
  *   - roundHalfUp ≡ Spark's round(col, n) on doubles;
  *   - NearestCentroid / PqEncodeCodes native expressions ≡ the UDF loops
  *     they replaced (same flat layout, early exit, strict-< tie rule);
  *   - lshTopK's narrowed dedup (score-then-dedup) ≡ dedup-then-score.
  */
class KernelEquivalenceSpec extends GraftSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(seed)
    // low-resolution coordinates force plenty of EXACT rounded-sim ties,
    // the regime where heap tie-breaks decide the result
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)((r.nextInt(5) - 2).toFloat)))
  }

  test("bruteForceTopK kernel ≡ crossJoin formulation, rounded ties included") {
    val vecs = randVecs(400, 8, seed = 11L).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 7)
    val kernel = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 10)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // the reference: the pre-r11 crossJoin + rankTopK pipeline, verbatim
    val c = vecs.select(col("vec_id").as("nn_id"),
      col("embedding").cast("array<double>").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", round(graft.functions.cosineSim(col("qv"), col("cv")), 4))
    val reference = Similarity.rankTopK(
        scored.select("query_id", "nn_id", "sim"), 10)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(kernel.toSeq == reference.toSeq)
  }

  test("bruteForceTopK kernel handles zero vectors and int ids like the crossJoin form") {
    val vecs = Seq(
      (0, Array(0.0f, 0.0f)), (1, Array(1.0f, 0.0f)),
      (2, Array(0.0f, 0.0f)), (3, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") <= 1),
      "vec_id", "embedding", k = 3)
    assert(out.schema("query_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.schema("nn_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = out.as[(Int, Int, Int, Double)].collect().toSet
    // zero-vector query: every sim is 0.0 (the denom==0 contract), ids break ties
    assert(rows.filter(_._1 == 0).toSeq.sortBy(_._2).map(_._3) == Seq(1, 2, 3))
  }

  test("roundHalfUp ≡ Spark round() over the sim domain") {
    val xs = Seq(0.12345, -0.12345, 0.123449999, 0.99995, -0.99995, 1.0, 0.0,
      -1.0, 0.00004999, 0.00005, Double.NaN, 1e-300, 0.7071067811865476) ++
      Seq.tabulate(1000)(i => math.cos(i.toDouble)) // irrational spread
    val viaSpark = xs.toDF("x").select(round(col("x"), 4)).as[Double].collect()
    val viaKernel = xs.map(Similarity.roundHalfUp(_, 4))
    viaSpark.zip(viaKernel).foreach { case (a, b) =>
      assert(java.lang.Double.compare(a, b) == 0, s"$a != $b")
    }
  }

  test("NearestCentroid/PqEncodeCodes ≡ the UDF argmin loops they replaced") {
    val r = new scala.util.Random(5L)
    val centers = Array.fill(7)(Array.fill(8)(r.nextDouble()))
    val books = Array.fill(2)(Array.fill(5)(Array.fill(4)(r.nextDouble())))
    val vecs = randVecs(300, 8, seed = 3L).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("cv"))
    // reference: the exact UDF bodies the native expressions replaced
    val k = centers.length; val dim = centers(0).length
    val flat = centers.flatten
    val refCell = udf { (vs: Seq[Double]) =>
      val v = vs.toArray
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < k) {
        var off = c * dim; var s = 0.0; var j = 0
        while (j < dim && s < bd) { val t = flat(off) - v(j); s += t * t; j += 1; off += 1 }
        if (s < bd) { bd = s; best = c }
        c += 1
      }
      best
    }
    val m = books.length; val ksub = books(0).length; val dsub = books(0)(0).length
    val bflat = books.flatten.flatten
    val refEnc = udf { (vs: Seq[Double]) =>
      val v = vs.toArray
      val codes = new Array[Byte](m)
      var j = 0
      while (j < m) {
        val vOff = j * dsub
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < ksub) {
          var off = (j * ksub + c) * dsub
          var s = 0.0; var d = 0
          while (d < dsub && s < bd) { val t = bflat(off) - v(vOff + d); s += t * t; d += 1; off += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        codes(j) = best.toByte; j += 1
      }
      codes
    }
    val got = vecs
      .withColumn("cell", Similarity.nearestCell(centers)(col("cv")))
      .withColumn("codes", graft.functions.pqEncodeCodes(col("cv"), books))
      .withColumn("cell_ref", refCell(col("cv")))
      .withColumn("codes_ref", refEnc(col("cv")))
    assert(got.filter(col("cell") =!= col("cell_ref")).count() == 0)
    assert(got.filter(col("codes") =!= col("codes_ref")).count() == 0)
  }

  test("lshTopK narrowed dedup ≡ dedup-then-score (pre-r11 shape)") {
    val vecs = randVecs(500, 8, seed = 29L).toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 5)
    val now = Similarity.lshTopK(vecs, queries, "vec_id", "embedding",
        k = 10, nBits = 4, tables = 3, probes = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // pre-r11 lshTopK, verbatim: dedup the wide candidate rows, then score
    val c0 = vecs.select(col("vec_id").as("nn_id"),
      col("embedding").cast("array<double>").as("cv"))
    val q0 = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("qv"))
    def sigs(df: org.apache.spark.sql.DataFrame, idName: String, vecName: String) =
      df.select(col(idName), col(vecName),
        posexplode(graft.functions.hyperplaneSignatures(col(vecName), 4, 3)))
        .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")
    val cs = sigs(c0, "nn_id", "cv")
    val qs0 = sigs(q0, "query_id", "qv")
    val qs = qs0.withColumn("sig", explode(array(
      col("sig") +: (0 until 2).map(b => col("sig").bitwiseXOR(lit(1L << b))): _*)))
    val ref = Similarity.rankTopK(
        cs.join(broadcast(qs), Seq("tbl", "sig"))
          .filter(col("nn_id") =!= col("query_id"))
          .dropDuplicates("query_id", "nn_id")
          .withColumn("sim", round(graft.functions.cosineSim(col("qv"), col("cv")), 4))
          .select("query_id", "nn_id", "sim"), 10)
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(now.toSeq == ref.toSeq)
  }
}
