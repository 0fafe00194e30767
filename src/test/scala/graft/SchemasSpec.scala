package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.api.Schemas

/** Schema field transforms (reference schemas/transforms/{AddFields,
  * DropFields,RenameFields,Cast,Select}). */
class SchemasSpec extends GraftSpec {
  import spark.implicits._

  private lazy val df = Seq((1, "a", 2.5), (2, "b", 3.5)).toDF("id", "name", "score")

  test("addFields / dropFields / renameFields / castFields") {
    val out = Schemas.castFields(
      Schemas.renameFields(
        Schemas.addFields(df, "doubled" -> (col("score") * 2)),
        "name" -> "label"),
      "id" -> LongType)
    assert(out.columns.toSeq == Seq("id", "label", "score", "doubled"))
    assert(out.schema("id").dataType == LongType)
    assert(out.filter(col("label") === "a").select("doubled").as[Double].head() == 5.0)
  }

  test("nest / unnest round-trip and nested path select") {
    val nested = Schemas.nest(df, "payload", "name", "score")
    assert(nested.columns.toSet == Set("id", "payload"))
    val picked = Schemas.selectFields(nested, "id", "payload.score")
    assert(picked.columns.toSeq == Seq("id", "score"))
    val back = Schemas.unnest(nested, "payload")
    assert(back.columns.toSet == Set("id", "name", "score"))
    assert(back.orderBy("id").as[(Int, String, Double)].collect().toSeq ==
      Seq((1, "a", 2.5), (2, "b", 3.5)))
  }

  test("dropFields removes nested struct fields by dotted path") {
    val nested = Schemas.nest(df, "payload", "name", "score")
    val out = Schemas.dropFields(nested, "payload.score")
    val fields = out.schema("payload").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(fields.fieldNames.toSeq == Seq("name"))
  }

  test("schema transform chains collapse to a single projection") {
    val out = Schemas.castFields(
      Schemas.renameFields(Schemas.addFields(df, "x" -> lit(1)), "name" -> "n"),
      "score" -> LongType)
    val plan = out.queryExecution.optimizedPlan.toString()
    // at most one Project (on local data the optimizer folds it into the
    // relation itself) — never a stack of per-transform projections
    assert(plan.linesIterator.count(_.trim.startsWith("Project")) <= 1, plan)
  }
}
