package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema field transforms (reference schemas/transforms/: AddFields,
  * DropFields, RenameFields, CastDoFn/Cast, Select with nested
  * FieldAccessDescriptor paths) as DataFrame helpers.
  *
  * All of these are projections — Catalyst collapses chains of them into
  * a single Project and prunes unused columns down to the scan, so a
  * pipeline of schema transforms costs one pass regardless of length. */
object Schemas {

  /** AddFields: append computed/default fields. */
  def addFields(df: DataFrame, fields: (String, Column)*): DataFrame =
    fields.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }

  /** DropFields, incl. nested paths via dropFields on struct columns. */
  def dropFields(df: DataFrame, names: String*): DataFrame = {
    val (nested, top) = names.partition(_.contains("."))
    val dropped = top.foldLeft(df)(_.drop(_))
    nested.foldLeft(dropped) { (d, path) =>
      val root = path.takeWhile(_ != '.')
      d.withColumn(root, col(root).dropFields(path.drop(root.length + 1)))
    }
  }

  /** RenameFields. */
  def renameFields(df: DataFrame, renames: (String, String)*): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Cast: widen/narrow field types (schemas/transforms/Cast.java). */
  def castFields(df: DataFrame, casts: (String, DataType)*): DataFrame =
    casts.foldLeft(df) { case (d, (name, t)) => d.withColumn(name, col(name).cast(t)) }

  /** Select with dotted nested paths (FieldAccessDescriptor `a.b.c`);
    * the flattened output column is named by the leaf segment. */
  def selectFields(df: DataFrame, paths: String*): DataFrame =
    df.select(paths.map(p => col(p).as(p.split('.').last)): _*)

  /** Nest: pack columns into a struct field (inverse of unnesting —
    * Beam Row values are arbitrarily nested). */
  def nest(df: DataFrame, structName: String, cols: String*): DataFrame =
    df.withColumn(structName, struct(cols.map(col): _*)).drop(cols: _*)

  /** Unnest one level of a struct column into top-level fields. */
  def unnest(df: DataFrame, structCol: String): DataFrame = {
    val others = df.columns.filterNot(_ == structCol).map(col)
    df.select(others :+ col(s"$structCol.*"): _*)
  }
}
