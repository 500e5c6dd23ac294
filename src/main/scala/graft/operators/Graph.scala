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
    // The rank vector is never materialized per node between iterations
    // (VERDICT r10 #7): pr_i(node) = base + d·m_i(node) with m missing ⇒
    // base, so iterations carry only the contribution sums `m` and inline
    // that identity — iteration 0 needs NO rank join at all (uniform 1/N
    // divides straight by degree), later iterations LEFT-join the tiny
    // |V|-row sums onto the cached src-partitioned edges (broadcast under
    // AQE), and the full per-node vector is produced once at the end.
    // Arithmetic is the exact expression the per-iteration nodes-join
    // form used — bit-identical ranks, (iters+1) fewer |V|-row shuffles.
    val base = (1.0 - damping) / n
    def blend(m: Column): Column =
      lit(base) + lit(damping) * coalesce(m, lit(0.0))
    def gridSum(c: Column): Column =
      sum(round(c * lit(1.0e12)).cast("decimal(28,0)")).cast("double") / lit(1.0e12)
    var sums: Option[DataFrame] = None // m per node; None = uniform start
    for (_ <- 0 until iters) {
      val contrib = sums match {
        case None =>
          eDeg.select(col("dst").as("node"), (lit(1.0 / n) / col("deg")).as("c"))
        case Some(sm) =>
          eDeg.join(sm.select(col("node").as("src"), col("m")), Seq("src"), "left")
            .select(col("dst").as("node"), (blend(col("m")) / col("deg")).as("c"))
      }
      sums = Some(contrib.groupBy("node").agg(gridSum(col("c")).as("m")))
    }
    sums match {
      case None => nodes.select(col("node"), lit(1.0 / n).as("pr"))
      case Some(sm) => nodes.join(sm, Seq("node"), "left")
        .select(col("node"), blend(col("m")).as("pr"))
    }
  }
}
