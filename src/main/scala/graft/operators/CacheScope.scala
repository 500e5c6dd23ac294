package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Deterministic end-of-operator cache release — the [[Graph.kCore]] /
  * [[Dedup.connectedComponents]] discipline, factored out.
  *
  * The hazard it closes (found diagnosing the r14 "q_pagerank stall
  * tail"): an operator that persists multi-consumer intermediates and
  * returns a LAZY plan over them can never unpersist — the entries
  * outlive the call in the session CacheManager. Two consequences:
  * memory accrues per invocation, and a LATER invocation with an
  * identical canonicalized plan silently reads the leaked entries, so
  * repeated benchmark runs measure cache luck instead of plan cost
  * (the first run is the only honest one — exactly the observed
  * 1-in-N ~5× "stall", which was the COLD run, not a stall).
  *
  * Fix shape: materialize the operator's bounded RESULT once
  * (`localCheckpoint(eager = true)` — block-backed, owned by the
  * returned Dataset, reclaimed by the context cleaner when the caller
  * drops it, unlike CacheManager entries), then release every
  * intermediate. Recompute cost is unaffected: the result no longer
  * has lineage into the released caches.
  *
  * Cluster-mode caveat (same as kCore's): localCheckpoint blocks do NOT
  * survive executor loss — a long-lived consumer on a real cluster
  * should write the result out (or `checkpoint()`) instead of holding
  * the returned handle across executor churn.
  */
private[graft] object CacheScope {

  /** Eagerly materialize `result`, then unpersist `intermediates`
    * (non-blocking). Safe ordering: the checkpoint completes before any
    * release, so the released lineage is never needed again.
    */
  def sealResult(result: DataFrame, intermediates: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true)
    intermediates.foreach(_.unpersist(false))
    out
  }
}
