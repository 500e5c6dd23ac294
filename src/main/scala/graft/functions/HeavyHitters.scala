package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter of a Misra–Gries summary: a term and its
  * (lower-bound) count.
  */
case class MgEntry(term: String, cnt: Long)

/** Aggregation buffer: at most `capacity` counters, mutated IN PLACE.
  *
  * The map is a plain `java.util.HashMap` (Kryo-encoded, so it only
  * serializes at shuffle/spill boundaries): `reduce` runs once per
  * TOKEN — the hottest loop in the whole aggregate — and an immutable
  * `Map.updated` there allocates a fresh path per token, pure GC
  * pressure. Boxed `java.lang.Long` values keep absent-key `get`s an
  * explicit null instead of a silent unbox-to-0.
  */
final class MgBuf(val m: java.util.HashMap[String, java.lang.Long])
    extends Serializable {
  /** Immutable view for assertions/inspection (NOT the hot path). */
  def counts: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    m.asScala.map { case (t, c) => t -> c.longValue() }.toMap
  }
}

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

  override def zero: MgBuf =
    new MgBuf(new java.util.HashMap[String, java.lang.Long](capacity * 2))

  override def reduce(b: MgBuf, term: String): MgBuf = {
    if (term == null) return b
    val m = b.m
    val c = m.get(term)
    if (c != null) m.put(term, c + 1L)
    else if (m.size < capacity) m.put(term, 1L)
    else {
      // full and unseen: decrement every counter in place (the arriving
      // item's implicit counter hits 0 and is discarded with the rest)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue.longValue()
        if (v > 1L) e.setValue(v - 1L) else it.remove()
      }
    }
    b
  }

  override def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
    val m = b1.m
    b2.m.forEach { (t: String, c: java.lang.Long) =>
      val prev = m.get(t)
      m.put(t, if (prev == null) c else java.lang.Long.valueOf(prev + c))
    }
    if (m.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the PODS'12 rule that keeps the n/(k+1)
      // error bound additive across merges
      val vals = new Array[Long](m.size)
      var i = 0
      val vit = m.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue.longValue()
        if (v > cut) e.setValue(v - cut) else it.remove()
      }
    }
    b1
  }

  override def finish(b: MgBuf): MgOut =
    MgOut(b.counts.toList.map { case (t, c) => MgEntry(t, c) }
      .sortBy(e => (-e.cnt, e.term)))

  // Kryo, not product: the buffer is a mutable object graph that only
  // crosses the wire at partial-aggregate boundaries (≤capacity entries)
  override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
  override def outputEncoder: Encoder[MgOut] = Encoders.product[MgOut]
}
