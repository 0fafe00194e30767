package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application — apply a CDC increment (inserts / updates /
  * deletes, each stamped with a monotone sequence) to a corpus snapshot.
  *
  * The nightly-ingest shape for a 100 TB lakehouse table without a table
  * format: the crawl emits a changelog; the snapshot is rewritten as
  * (rows whose key saw no change) ∪ (latest non-delete change rows).
  *
  * Scale contract: the SNAPSHOT never shuffles. The only wide exchange is
  * the latest-per-key reduction over the changelog (increment-sized); the
  * key set of changed rows then reaches the snapshot as a broadcast
  * anti-join (`broadcastChanges = true`, the default — an increment whose
  * KEYS don't fit in a broadcast is rare even at 100 TB). For the
  * exceptional huge-increment case, `broadcastChanges = false` leaves the
  * join strategy to Catalyst/AQE (sort-merge on a bucketed snapshot key
  * stays shuffle-free on the snapshot side).
  *
  * Semantics (last-writer-wins):
  *  - per key, the change with the highest `seqCol` governs (ties broken
  *    by `opCol` descending for determinism — sequences should be unique
  *    per key in a well-formed changelog);
  *  - governing op 'D' removes the key; 'I'/'U' replace (or insert) the
  *    row with the change's payload columns;
  *  - keys absent from the changelog keep their snapshot row.
  *
  * Laws (pinned in CurationSpec):
  *  - idempotent: apply(apply(s, c), c) == apply(s, c);
  *  - composition: apply(apply(s, c1), c2) == apply(s, c1 ∪ c2) whenever
  *    overlapping keys' sequences in c2 exceed those in c1 (sequential
  *    batches of a monotone changelog).
  *
  * Reference analog: the reference models upserts only through sinks with
  * native upsert support; it has no engine-level changelog-apply
  * operator. This is a pipeline-realism extension, same spirit as
  * `Dedup.appendToBandIndex` / `Similarity.appendToIvfIndex`.
  */
object Cdc {

  /** Latest change per key: one increment-sized shuffle, map-side
    * combined by the window-over-shuffle plan Catalyst emits. Output
    * keeps all change columns (payload + seq + op). */
  def latestChanges(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "latestChanges needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply `changes` to `snapshot`. The result has exactly the snapshot's
    * columns; change payload columns must cover them. */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String,
      broadcastChanges: Boolean = true): DataFrame = {
    val outCols = snapshot.columns.toSeq
    val missing = outCols.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changelog lacks snapshot columns: ${missing.mkString(", ")}")
    val latest = latestChanges(changes, keyCols, seqCol, opCol)
    val changedKeys = latest.select(keyCols.map(col): _*)
    val keysSide = if (broadcastChanges) broadcast(changedKeys) else changedKeys
    val kept = snapshot.join(keysSide, keyCols, "left_anti")
    val applied = latest.filter(col(opCol) =!= lit("D"))
      .select(outCols.map(col): _*)
    kept.unionByName(applied)
  }
}
