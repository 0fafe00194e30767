package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Driver-local Lloyd (Similarity.localKMeans): the bounded-sample fit
  * that replaced Spark ML for the IVF/PQ codebooks. Pins determinism,
  * cluster recovery on separated data, the shared-sample PQ shapes, and
  * the nearestCell assignment contract. */
class LocalKMeansSpec extends GraftSpec {

  private def blob(cx: Double, cy: Double, n: Int, seed: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array(cx + rnd.nextGaussian() * 0.05, cy + rnd.nextGaussian() * 0.05))
  }

  test("localKMeans recovers well-separated clusters and is deterministic") {
    val pts = (blob(0, 0, 200, 1) ++ blob(10, 0, 200, 2) ++
      blob(0, 10, 200, 3) ++ blob(10, 10, 200, 4)).toArray
    val c1 = Similarity.localKMeans(pts, k = 4, maxIter = 10, seed = 7L)
    val c2 = Similarity.localKMeans(pts, k = 4, maxIter = 10, seed = 7L)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "same seed must reproduce bit-identical centers")
    // every true blob center has a fitted center within 0.2
    val trueCenters = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0))
    trueCenters.foreach { case (tx, ty) =>
      val d = c1.map(c => math.hypot(c(0) - tx, c(1) - ty)).min
      assert(d < 0.2, s"no fitted center near ($tx,$ty); best distance $d")
    }
  }

  test("localKMeans caps k at the sample size and tolerates duplicates") {
    val pts = Array.fill(5)(Array(1.0, 2.0)) // 5 identical points
    val c = Similarity.localKMeans(pts, k = 16, maxIter = 3, seed = 1L)
    assert(c.length == 5) // kk = min(k, n)
    assert(c.forall(ctr => ctr(0) == 1.0 && ctr(1) == 2.0))
  }

  test("nearestCell assigns every vector to its closest codebook entry") {
    import spark.implicits._
    val centers = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val rows = Seq(
      (0L, Seq(0.2, -0.1)), (1L, Seq(9.5, 0.4)), (2L, Seq(0.3, 9.8)),
      (3L, Seq(4.0, 0.0)) // closer to center 0 (d=4) than center 1 (d=6)
    ).toDF("id", "cv")
    val out = rows.withColumn("cell", Similarity.nearestCell(centers)(col("cv")))
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 0))
  }

  test("pqTrain local path matches the contract shapes on a collected sample") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vecs = (0 until 300).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(vecs, "embedding", m = 4, ksub = 8,
      trainFraction = 1.0)
    assert(books.length == 4)
    assert(books.forall(_.length == 8))
    assert(books.forall(_.forall(_.length == 4)))
  }

  test("collectSample falls back to the full corpus when the sample is thin") {
    import spark.implicits._
    val cv = (0 until 100).map(i => Seq(i.toDouble)).toDF("cv")
    // fraction 0.01 of 100 rows ≈ 1 row < minRows=50 → full collect
    val s = Similarity.collectSample(cv, minRows = 50L, seed = 42L, fraction = 0.01)
    assert(s.isDefined && s.get.length == 100)
  }
}
