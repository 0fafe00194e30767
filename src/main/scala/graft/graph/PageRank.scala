package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over an edge list — the link-graph quality
  * signal a crawl-curation pipeline derives per host/domain (Common
  * Crawl publishes exactly this ranking for its hosts) and then joins
  * onto documents as a quality weight for [[graft.api.Sampling]] /
  * corpus mixing.
  *
  * Recurrence (fixed `iters` rounds, damping `d`):
  * {{{ rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) / outdeg(u) }}}
  * Dangling nodes (no out-edges) lose their mass — the simple variant;
  * documented so an independent engine can reproduce rank-for-rank.
  *
  * 100 TB shape: the weighted edge list `(src, dst, 1/outdeg)` is built
  * once (one agg + one join) and checkpointed; each round is ONE shuffle
  * join on src plus ONE aggregation on dst with map-side combine —
  * O(iters) rounds total, independent of graph diameter. Lineage is
  * truncated per round with an eager localCheckpoint (same discipline as
  * [[graft.dedup.DupClusters]]); the only driver action is the node
  * count (one scalar). Zero-weight self-loops keep isolated and
  * sink-only nodes present in every round's output.
  */
object PageRank {

  /** (node, rank) after `iters` rounds. `edges` must have (src, dst)
    * columns (duplicates allowed — they are weighted as parallel edges);
    * `nodes` one `node` column covering at least every endpoint. */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      d: Double = 0.85): DataFrame = {
    val n = nodes.count() // one scalar — the documented bounded collect
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("__outdeg"))
    val weighted = edges.join(outdeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("__outdeg")).as("w"))
      // zero-weight self-loop per node: every node appears as a dst each
      // round, so sinks and isolated nodes keep their teleport rank
      .union(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(0.0).as("w")))
      .localCheckpoint(true)
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      rank = weighted.join(rank, weighted("src") === rank("node"))
        .groupBy(col("dst"))
        .agg((lit((1.0 - d) / n) + lit(d) * sum(col("rank") * col("w")))
          .as("rank"))
        .select(col("dst").as("node"), col("rank"))
        .localCheckpoint(true)
    }
    rank
  }
}
