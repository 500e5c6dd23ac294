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
}
