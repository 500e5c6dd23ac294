package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph computation over edge lists — the ranking complement
  * of the connected-components machinery in [[Dedup]]. First member:
  * PageRank, the standard authority score a web-corpus curation pipeline
  * uses to weight domains/documents before sampling.
  *
  * Scale design: one iteration = one src-keyed join (rank/out-degree onto
  * edges) plus one dst-keyed aggregate — exactly the shuffles the problem
  * requires, nothing quadratic, nothing driver-side except the node
  * count (one scalar). Iterations are few (the score converges
  * geometrically in the damping factor), so the 100-TB cost is
  * O(iters · |E|) shuffled bytes with map-side combine on the
  * contribution sum.
  *
  * Determinism (oracle-checkable): contribution sums go through the
  * fixed 1e-12 decimal grid (see [[Clustering]] — a direct double→
  * decimal cast is not tie-portable across engines); per-row division
  * and the damping blend are fixed-order IEEE doubles.
  */
object Graph {

  /** PageRank after `iters` power iterations over the DISTINCT edge set.
    * Nodes are everything appearing as src or dst; rank starts uniform
    * 1/N. Dangling nodes (no out-edges) leak their mass — the simplified
    * variant; add explicit sink edges first if total-mass conservation
    * matters. Returns (node, pr).
    */
  def pagerank(edges: DataFrame, src: Column, dst: Column, iters: Int,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
    // (src, dst, deg) materialized ONCE: the degree join would otherwise
    // re-shuffle the (large) edge list every iteration — per-iteration
    // cost drops to one src-keyed rank join + one dst-keyed sum.
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .cache()
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "pagerank over an empty edge set")
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = eDeg
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
      val sums = contrib.groupBy("node")
        .agg(((sum(round(col("c") * lit(1.0e12)).cast("decimal(28,0)"))
          .cast("double") / lit(1.0e12))).as("m"))
      pr = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0)))
            .as("pr"))
    }
    pr
  }
}
