package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

class QualityClassifierSpec extends GraftSpec {
  import spark.implicits._

  // separable corpus: "good" docs are varied prose, "bad" docs are the
  // low-quality shapes a filter must catch (repetition, boilerplate)
  private lazy val labeled = (
    (0 until 40).map { i =>
      (s"article $i discusses the history of science and careful reasoning " +
        s"with varied vocabulary item$i plus thoughtful analysis of topic$i", 1.0)
    } ++ (0 until 40).map { i =>
      (s"buy now click here buy now click here buy now spam$i " +
        "click here buy now click here", 0.0)
    }).toDF("text", "label")

  test("trained classifier separates quality classes on held-in data") {
    val (w, b) = QualityClassifier.train(labeled, "text", "label",
      dims = 512, maxIter = 50)
    val scored = QualityClassifier.score(labeled, "text", w, b)
      .select(col("label"), col("quality_score")).as[(Double, Double)].collect()
    val acc = scored.count { case (l, s) => (s >= 0.5) == (l >= 0.5) } / 80.0
    assert(acc >= 0.95, s"accuracy $acc")
    // and it generalizes across the two shapes, not memorized ids
    val unseen = Seq(
      "a detailed discussion of experimental methodology and replication",
      "click here buy now click here buy now click here").toDF("text")
    val u = QualityClassifier.score(unseen, "text", w, b)
      .select("quality_score").as[Double].collect()
    assert(u(0) > u(1), s"good=${u(0)} bad=${u(1)}")
  }

  test("declarative scan-stage scorer equals the fitted model's probability") {
    // the contract that lets 100 TB scoring run without the model object:
    // score() over literal weights must reproduce LogisticRegression's
    // own P(label=1) on the same features
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val (w, b) = QualityClassifier.train(labeled, "text", "label",
      dims = 256, maxIter = 30)
    val dims = 256
    val probs = labeled.select("text").as[String].collect().map { text =>
      val grams = QualityClassifier.jvmNgrams(text)
      val z = b + grams.map(g => w(QualityClassifier.jvmBucket(g, dims))).sum /
        math.max(grams.length, 1)
      1.0 / (1.0 + math.exp(-z))
    }
    val scored = QualityClassifier.score(labeled, "text", w, b)
      .select("quality_score").as[Double].collect()
    probs.zip(scored).foreach { case (p, s) =>
      assert(math.abs(p - s) < 1e-9, s"model $p vs scorer $s")
    }
  }

  test("portable bucket: jvm twin equals the SQL expression") {
    val terms = Seq("alpha", "beta gamma", "x", "Ünïcode").toDF("t")
    val sql = terms.select(QualityClassifier.bucket(col("t"), 1024).as("b"))
      .as[Long].collect()
    val jvm = Seq("alpha", "beta gamma", "x", "Ünïcode")
      .map(QualityClassifier.jvmBucket(_, 1024).toLong)
    assert(sql.toSeq == jvm)
  }

  test("native scorer equals the declarative closed form bit-for-bit") {
    val w = Array.tabulate(64)(i => (i % 9 - 4) * 0.17)
    val docs = Seq("some text here", "", "   ", "single",
      "a b c d e f g h i j k", "Mixed CASE\tspacing  and tabs",
      "Ünïcode çöp gürültü metin örneği").toDF("text")
    val both = docs.select(
      QualityClassifier.scoreCol(col("text"), w, 0.3).as("n"),
      QualityClassifier.scoreColDeclarative(col("text"), w, 0.3).as("d"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, d) => assert(n == d, s"$n != $d") }
  }

  test("empty and single-token text score through the bias path") {
    val w = Array.fill(64)(1.0)
    val out = QualityClassifier.score(
      Seq((1L, ""), (2L, "word")).toDF("id", "text"), "text", w, 0.0)
      .select("id", "quality_score").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 0.5) < 1e-12) // no grams → sigmoid(bias)
    assert(out(2L) > 0.5) // one unigram, weight 1
  }
}
