package graft

import org.apache.spark.sql.functions._
import graft.api.Dataflow._

class DataflowSpec extends GraftSpec {
  import spark.implicits._

  private lazy val kv = Seq(("a", 1), ("b", 2), ("a", 3)).toDF("key", "value")

  test("mapElements / filterBy stay declarative") {
    val out = kv.mapElements(col("key"), (col("value") * 2).as("v2"))
      .filterBy(col("v2") > 2)
    assert(out.collect().map(r => (r.getString(0), r.getInt(1))).toSet == Set(("b", 4), ("a", 6)))
  }

  test("flattenWith = union all with missing columns") {
    val other = Seq(("c", 9, "extra")).toDF("key", "value", "note")
    val out = kv.flattenWith(other)
    assert(out.count() == 4)
    assert(out.columns.toSet == Set("key", "value", "note"))
  }

  test("partitionInto splits disjointly and completely") {
    val parts = kv.partitionInto(2, col("value") % 2)
    assert(parts(0).count() + parts(1).count() == 3)
    assert(parts(1).select("value").as[Int].collect().forall(_ % 2 == 1))
  }

  test("kvSwap / keys / values") {
    val swapped = kv.kvSwap
    assert(swapped.columns.toSeq == Seq("key", "value"))
    assert(swapped.keys.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("parDo streams per-partition with setup-once semantics") {
    val out = kv.parDo { () =>
      val prefix = "p-" // per-partition setup
      row => Iterator.single(prefix + row.getString(0))
    }
    assert(out.collect().toSet == Set("p-a", "p-b"))
  }

  test("withFailures routes try_* nulls to the failure output") {
    val df = Seq("1", "2", "oops").toDF("s")
    val (ok, failed) = df.withFailures(expr("try_cast(s AS INT)"), "n", col("s").isNotNull)
    assert(ok.filter(col("n").isNotNull).count() == 2)
    assert(failed.as[String].collect().toSeq == Seq("oops"))
  }

  test("taggedOutputs: one pass, n outputs") {
    val outs = kv.taggedOutputs(when(col("value") > 1, "big").otherwise("small"),
      Seq("big", "small"))
    assert(outs("big").count() == 2 && outs("small").count() == 1)
  }
}
