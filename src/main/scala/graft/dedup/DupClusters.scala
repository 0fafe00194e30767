package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn a near-dup PAIR list (the output of
  * [[Dedup.minhashNearDups]] / [[Dedup.simhashNearDups]]) into connected
  * components, then keep one canonical document per component.
  *
  * Pairs alone under-deduplicate: if A~B and B~C, keeping "one of each
  * pair" can retain two of {A,B,C}. Production corpus dedup resolves the
  * transitive closure first — exactly what the reference expresses as a
  * self-joined CoGroupByKey fixpoint and what every large-scale dedup
  * pipeline (e.g. the C4/Gopher recipes) runs between pair generation and
  * filtering.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * shuffle-native formulation. Each half-round is one key-partitioned
  * aggregation plus one equi-join on the same key (Catalyst reuses the
  * exchange), edges only ever point toward smaller ids, and the edge set
  * converges to a star per component in O(log n) rounds regardless of
  * component diameter — a 100k-doc duplicate chain resolves in ~17 rounds,
  * where naive min-label propagation would need 100k. No driver-side
  * state: the driver loop only compares two scalar aggregates per round
  * for the fixpoint test.
  *
  * At convergence every edge is (member → component-min), so the component
  * label IS the canonical (minimum) document id — canonical selection is
  * a free anti-join, no extra shuffle.
  */
object DupClusters {

  /** Connected components over an undirected pair list.
    *
    * @param pairs  DataFrame with two id columns (any numeric/orderable
    *               type); each row is an undirected edge.
    * @return (`idCol`, `clusterCol`) — one row per node that appears in
    *         `pairs`, labeled with the minimum id of its component (the
    *         component root labels itself).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      idCol: String = "doc_id", clusterCol: String = "cluster_id",
      maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession

    // normalize: (u, v) with u != v, deduped. Each round is CHECKPOINTED
    // (lineage truncated): large-star references the edge set twice, so
    // without truncation the logical plan doubles every round — exponential
    // planning cost long before any data is big. localCheckpoint keeps the
    // blocks in the block manager (ContextCleaner frees prior rounds once
    // unreferenced); on a cluster with executor loss, swap in
    // spark.sparkContext.setCheckpointDir + .checkpoint() for the
    // fault-tolerant variant.
    var edges = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    // large-star: symmetrize; per node u with neighbors N(u), attach every
    // LARGER neighbor to m = min(N(u) ∪ {u}).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: orient each edge large→small; per node h, attach h and
    // all its smaller neighbors to their minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("u"), col("v")).as("h"),
        least(col("u"), col("v")).as("l"))
      val mins = oriented.groupBy("h").agg(min(col("l")).as("m"))
      val moved = oriented.join(mins, "h")
        .select(col("l").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      moved.union(mins.select(col("h").as("u"), col("m").as("v")))
        .distinct()
    }

    // fixpoint: a round is large-star ∘ small-star; converged when the
    // (count, order-insensitive hash-xor) signature is stable. XOR of
    // per-edge 64-bit hashes is the cheap distributed set-equality test
    // (commutative, overflow-free under ANSI mode, collision odds 2^-64)
    // — two scalar aggs, no driver-side edge materialization.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")
      ).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextSig = signature(next)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")

    // star edges are (member → root); the root labels itself
    edges.select(col("u").as(idCol), col("v").as(clusterCol))
      .union(edges.select(col("v").as(idCol), col("v").as(clusterCol)).distinct())
      .distinct()
  }

  /** Keep one canonical document per duplicate cluster: the component
    * minimum id (deterministic; swap in a quality-ranked choice by
    * re-keying `pairs` on a quality-ordered surrogate id upstream).
    * Documents in no cluster pass through. One anti-join on `idCol` —
    * the labels side is |dup-involved docs| rows, tiny next to the corpus,
    * so at scale the join broadcasts. */
  def dedupKeepCanonical(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol, idCol, "cluster_id")
    val losers = labels.filter(col(idCol) =!= col("cluster_id")).select(idCol)
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/test split: assign every document a split by
    * hashing its duplicate-CLUSTER label, not its own id — near-duplicate
    * documents land on the same side by construction, so the held-out set
    * never contains a paraphrase of a training document (the train/test
    * contamination a per-document split silently creates; Lee et al.,
    * ACL'22 measure the resulting eval inflation). Documents in no
    * cluster are their own singleton label.
    *
    * Deterministic and engine-portable: split = "train" iff the 4-hex md5
    * prefix of the label sorts below [[graft.api.Sampling.rateThreshold]]
    * (trainFrac) — same closed form as the corpus-mix operator, so the
    * split is restartable and reproducible at any scale. Cost beyond the
    * pair-finding: the components fixpoint on |dup pairs| rows + one
    * broadcast-sized left join of labels onto the corpus. */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      trainFrac: Double): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol, idCol, "cluster_id")
    val thr = graft.api.Sampling.rateThreshold(trainFrac)
    docs.join(labels, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split",
        when(substring(md5(col("cluster_id").cast("string")), 1, 4) < thr,
          lit("train")).otherwise(lit("test")))
  }
}
