package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connectivity
  * ([[Dedup.connectedComponents]]): PageRank with proper dangling-mass
  * redistribution — the web-graph quality prior behind PageRank-weighted
  * corpus selection (rank the link graph, join ranks onto documents, feed
  * [[Stats.weightedSample]]).
  *
  * Scale shape per iteration: ONE shuffle join (edges-with-degree ⋈ ranks
  * on src) + one map-side-combined `groupBy(dst)` + one scalar dangling
  * aggregate; the edge set with its out-degrees is computed once and
  * cached across iterations. Ranks are cached and the previous iteration
  * unpersisted (the [[Dedup.connectedComponents]] loop pattern). Fixed
  * small iteration counts keep lineage linear; if you push past ~10
  * iterations, localCheckpoint the ranks periodically.
  */
object Graph {

  /** PageRank over directed `edges`. Multi-edges are weighted (a src
    * counts each parallel edge in its out-degree and contributes once per
    * edge) — `.distinct()` the edges first for simple-graph semantics.
    * Dangling nodes (no out-edges) redistribute their rank uniformly.
    * Returns (node long, rank double); ranks sum to 1. */
  def pageRank(edges: DataFrame, src: String, dst: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping > 0.0 && damping < 1.0, "damping in (0, 1)")
    val e = edges.select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
    val nodes = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node"))).distinct().cache()
    val nTotal = nodes.count().toDouble
    // cached: the dangling-mass anti-join re-reads it every iteration
    val outDeg = e.groupBy("u").agg(count(lit(1)).as("deg")).cache()
    val withDeg = e.join(outDeg, "u").cache()
    withDeg.count()
    var ranks = nodes.withColumn("rank", lit(1.0 / nTotal)).cache()
    for (_ <- 0 until iterations) {
      val danglingMass = ranks
        .join(outDeg, ranks("node") === outDeg("u"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.join(ranks, col("u") === col("node"))
        .groupBy(col("v").as("cnode"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      val updated = nodes.join(contribs, col("node") === col("cnode"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / nTotal) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + lit(danglingMass / nTotal))).as("rank"))
        .cache()
      updated.count()
      ranks.unpersist(blocking = false)
      ranks = updated
    }
    nodes.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    withDeg.unpersist(blocking = false)
    ranks
  }
}
