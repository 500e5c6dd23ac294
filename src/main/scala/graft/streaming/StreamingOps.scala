package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators (the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` surface).
  */
object StreamingOps {

  /** Streaming exact dedup: emit the first row seen per key, suppress every
    * later occurrence — state persists across microbatches, so a key seen
    * in batch 1 stays suppressed in batch 1000. The canonical use is
    * exactly-once ingestion of an at-least-once feed.
    *
    * State is one boolean per key. Production deployments bound it with a
    * timeout (`GroupStateTimeout.EventTimeTimeout` + watermark) once keys
    * age out of the dedup horizon; unbounded here to keep the semantics
    * exact.
    */
  def firstPerKey[K: Encoder, T: Encoder](ds: Dataset[T], key: T => K): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] = org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
  }

  /** [[firstPerKey]] with BOUNDED state: each key's seen-marker expires
    * `horizonMs` of EVENT TIME after its LAST sighting, so state size
    * tracks the number of keys active inside the horizon instead of every
    * key ever seen — the difference between a dedup stream that runs for
    * years and one that OOMs its state store.
    *
    * Requires a watermark on the input (`ds.withWatermark(...)` upstream —
    * `EventTimeTimeout` fires when the watermark passes the timeout). The
    * timeout anchors on the rows' own event time (`eventTimeMs`), NOT on
    * the current watermark: the watermark is 0 until the first batch
    * completes, and a watermark-anchored timeout set then would be stale
    * the moment real event times establish one — expiring every key
    * immediately. Every sighting REFRESHES the timeout (sliding horizon),
    * so a hot key stays deduped for as long as it keeps arriving.
    */
  def firstPerKeyExpiring[K: Encoder, T: Encoder](
      ds: Dataset[T], key: T => K, eventTimeMs: T => Long, horizonMs: Long): Dataset[T] = {
    implicit val boolEnc: Encoder[Boolean] = org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // watermark passed the horizon with no new sightings: forget
            state.remove()
            Iterator.empty
          } else {
            var first: Option[T] = None
            var maxTs = Long.MinValue
            rows.foreach { r =>
              if (first.isEmpty) first = Some(r)
              val t = eventTimeMs(r)
              if (t > maxTs) maxTs = t
            }
            val fresh = !state.exists
            state.update(true)
            // timeouts must stay ahead of the current watermark (the API
            // rejects a timeout at/behind it; a late batch could otherwise
            // try to set one)
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            if (fresh) first.iterator else Iterator.empty
          }
      }
  }
}
