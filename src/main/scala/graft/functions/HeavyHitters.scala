package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter of a Misra–Gries summary: a term and its
  * (lower-bound) count.
  */
case class MgEntry(term: String, cnt: Long)

/** Aggregation buffer: at most `capacity` counters. */
case class MgBuf(counts: Map[String, Long])

/** Result: candidates sorted (cnt desc, term asc) for a stable display
  * order — counts are LOWER BOUNDS, not exact (see guarantee below).
  */
case class MgOut(items: List[MgEntry])

/** Misra–Gries frequent-items summary ("Finding repeated elements",
  * Misra & Gries 1982) as a typed `Aggregator`, merged with the
  * counter-reduction rule of Agarwal et al., "Mergeable Summaries"
  * (PODS'12) — so Spark's partial aggregation applies: each map task
  * reduces its tokens to ONE ≤`capacity`-entry buffer before the
  * shuffle, and merge order never weakens the bound.
  *
  * Guarantee (any partitioning, any merge tree): for every term x with
  * true count f(x) over n total items,
  *   f(x) − n/(capacity+1)  ≤  estimate(x)  ≤  f(x),
  * and estimate(x) = 0 only if x is absent from the summary. Hence any
  * term with f(x) > n/(capacity+1) SURVIVES in the summary — the
  * candidate-superset property the exact two-pass heavy-hitters query
  * builds on ([[graft.operators.TextAnalysis.heavyHitters]]).
  *
  * The summary's exact contents depend on merge order (Spark task
  * scheduling), so raw output is for candidate generation, not for
  * value-checked results — the guarantee, not the content, is the
  * contract (property-tested across repartitionings in
  * HeavyHittersSpec).
  */
class MisraGries(capacity: Int) extends Aggregator[String, MgBuf, MgOut] {
  require(capacity > 0, s"Misra-Gries needs capacity > 0, got $capacity")

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, term: String): MgBuf = {
    if (term == null) b
    else b.counts.get(term) match {
      case Some(c) => MgBuf(b.counts.updated(term, c + 1))
      case None if b.counts.size < capacity => MgBuf(b.counts.updated(term, 1L))
      case None =>
        // full and unseen: decrement every counter (the arriving item's
        // implicit counter hits 0 and is discarded with the rest)
        MgBuf(b.counts.collect { case (t, c) if c > 1 => t -> (c - 1) })
    }
  }

  override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
    val combined = b2.counts.foldLeft(b1.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= capacity) MgBuf(combined)
    else {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the PODS'12 rule that keeps the n/(k+1)
      // error bound additive across merges
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
      MgBuf(combined.collect { case (t, c) if c > cut => t -> (c - cut) })
    }
  }

  override def finish(b: MgBuf): MgOut =
    MgOut(b.counts.toList.map { case (t, c) => MgEntry(t, c) }
      .sortBy(e => (-e.cnt, e.term)))

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
}
