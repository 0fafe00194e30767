package graft

import org.apache.spark.sql.functions._

import graft.functions.{tdigestMerge, tdigestQuantile, tdigestSketch}
import graft.plans.{GraftExtensions, TDigest}

class TDigestSpec extends GraftSpec {
  import spark.implicits._

  // deterministic skewed sample: exp(N(0,1))-ish via irwin-hall of hashes
  private def sample(n: Int): Array[Double] =
    Array.tabulate(n) { i =>
      val u1 = ((i * 2654435761L) & 0xffffffL).toDouble / (1 << 24)
      val u2 = ((i * 40503L + 7) & 0xffffffL).toDouble / (1 << 24)
      math.exp(3 * (u1 + u2 - 1)) * 100
    }

  private def exactQuantile(xs: Array[Double], q: Double): Double = {
    val s = xs.sorted
    val rank = q * (s.length - 1)
    val lo = rank.toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (rank - lo) * (s(hi) - s(lo))
  }

  test("local digest: accuracy at mid and tail quantiles on skewed data") {
    val xs = sample(50000)
    val d = new TDigest(200)
    xs.foreach(d.add(_))
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.95, 0.99, 0.999)) {
      val exact = exactQuantile(xs, q)
      val est = d.quantile(q)
      val relErr = math.abs(est - exact) / math.abs(exact)
      assert(relErr < 0.01, s"q=$q exact=$exact est=$est relErr=$relErr")
    }
  }

  test("merge law: sharded digests merge to the same answer as one digest") {
    val xs = sample(40000)
    val whole = new TDigest(200)
    xs.foreach(whole.add(_))
    val shards = xs.grouped(5000).map { chunk =>
      val d = new TDigest(200)
      chunk.foreach(d.add(_))
      d
    }
    val merged = new TDigest(200)
    shards.foreach(merged.merge)
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val exact = exactQuantile(xs, q)
      assert(math.abs(merged.quantile(q) - exact) / math.abs(exact) < 0.01,
        s"merged digest drifted at q=$q")
      // and the serialized roundtrip preserves the estimate exactly
      val rt = TDigest.deserialize(merged.serialize())
      assert(rt.quantile(q) == merged.quantile(q))
    }
  }

  test("digest size stays bounded by compression regardless of input size") {
    val d = new TDigest(100)
    sample(200000).foreach(d.add(_))
    // serialized: 28-byte header + 16 bytes/centroid; k1 bound ~ 2*delta
    assert(d.serialize().length < 28 + 16 * 220,
      s"digest grew past the compression bound: ${d.serialize().length} bytes")
  }

  test("aggregate: partial aggregation across partitions matches exact within 1%") {
    val xs = sample(30000)
    val df = spark.sparkContext.parallelize(xs.toSeq, 13).toDF("x")
    val row = df.agg(
      tdigestQuantile(tdigestSketch(col("x")), 0.5).as("p50"),
      tdigestQuantile(tdigestSketch(col("x")), 0.99).as("p99"),
      expr("percentile(x, 0.5)").as("e50"),
      expr("percentile(x, 0.99)").as("e99")).head()
    assert(math.abs(row.getDouble(0) - row.getDouble(2)) / row.getDouble(2) < 0.01)
    assert(math.abs(row.getDouble(1) - row.getDouble(3)) / row.getDouble(3) < 0.01)
  }

  test("aggregate: two-level rollup via tdigest_merge matches direct digest") {
    val df = spark.range(20000)
      .select((col("id") % 4).as("g"), (col("id") % 97).cast("double").as("x"))
    val perGroup = df.groupBy("g").agg(tdigestSketch(col("x")).as("sk"))
    val rolled = perGroup.agg(tdigestQuantile(tdigestMerge(col("sk")), 0.5).as("p50"))
      .head().getDouble(0)
    val direct = df.agg(tdigestQuantile(tdigestSketch(col("x")), 0.5).as("p50"))
      .head().getDouble(0)
    // same values, different merge order: estimates agree to sketch accuracy
    assert(math.abs(rolled - direct) / 48.0 < 0.02, s"rolled=$rolled direct=$direct")
  }

  test("SQL registration: tdigest_sketch/merge/quantile usable from spark.sql") {
    GraftExtensions.install(spark)
    spark.range(10000).select(col("id").cast("double").as("x"))
      .createOrReplaceTempView("td_vals")
    val est = spark.sql(
      """SELECT tdigest_quantile(tdigest_sketch(x), CAST(0.9 AS DOUBLE)) AS p90
        |FROM td_vals""".stripMargin).head().getDouble(0)
    assert(math.abs(est - 8999.1) / 8999.1 < 0.01, s"p90=$est")
    // empty input → null sketch
    val nullRow = spark.sql(
      "SELECT tdigest_sketch(x) AS sk FROM td_vals WHERE x < 0").head()
    assert(nullRow.isNullAt(0))
  }
}
