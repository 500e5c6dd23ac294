package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.streaming.StreamingOps

/** Streaming per-key rate cap: admission ranks must equal the batch
  * window's row_number (capPerKeyWindow is the oracle), including across
  * microbatch boundaries and under out-of-order arrival within a batch.
  */
class StreamingRateCapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  /** Events are (key, eid, eventTimeMs); event time rides as both the
    * watermarked Timestamp and micros (ms*1000). Returns admitted
    * (eid, bucket, rn) triples.
    */
  private def run(batches: Seq[Seq[(Long, Long, Long)]], windowMicros: Long,
                  n: Int): Set[(Long, Long, Int)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Long)]
    val df = mem.toDS().toDF("k", "eid", "t", "us").withWatermark("t", "0 seconds")
    val out = StreamingOps.rateCapStream(df, "k", "t", "us", "eid", windowMicros, n)
    val qname = s"stream_rate_cap_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (k, eid, ms) => (k, eid, ts(ms), ms * 1000L) })
        q.processAllAvailable()
      }
      // drain: advance the watermark past everything, then fire timeouts
      mem.addData((-1L, -1L, ts(10000000L), 10000000L * 1000L))
      q.processAllAvailable()
      mem.addData((-1L, -2L, ts(20000000L), 20000000L * 1000L))
      q.processAllAvailable()
      spark.table(qname).where(col("k") >= 0)
        .select("eid", "bucket", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    } finally q.stop()
  }

  private def batchRef(rows: Seq[(Long, Long, Long)], windowMicros: Long,
                       n: Int): Set[(Long, Long, Int)] =
    Sampling.capPerKeyWindow(
        rows.map { case (k, eid, ms) => (k, eid, ms * 1000L) }.toDF("k", "eid", "us"),
        col("k"), col("us"), col("eid"), windowMicros, n)
      .select("eid", "bucket", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("single batch: admission ranks equal the batch window") {
    // key 1: four events in one bucket (two tie on ts), one in the next;
    // key 2: one event. window = 1000ms = 1e6 us, n = 2.
    val rows = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 3L), (1L, 4L, 7L),
      (1L, 5L, 1500L), (2L, 6L, 1L))
    val got = run(Seq(rows), windowMicros = 1000000L, n = 2)
    assert(got == batchRef(rows, 1000000L, 2))
    // and the cap actually bit: eid=2 (tie loser ranks 3rd) was dropped
    assert(!got.exists(_._1 == 2L))
  }

  test("cap state persists across microbatches within a bucket") {
    // two events in batch 1 fill the bucket; batch 2's later event in the
    // SAME bucket must be rejected even though it arrives separately
    val all = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L))
    val got = run(Seq(all.take(2), all.drop(2)), windowMicros = 1000000L, n = 2)
    assert(got == batchRef(all, 1000000L, 2))
    assert(got.map(_._1) == Set(1L, 2L))
  }

  test("out-of-order arrival within a batch folds in event-time order") {
    // arrival order 30,10,20 — ranks must follow event time, so the cap
    // drops the ts=30 event, not the late-arriving ts=10 one
    val rows = Seq((1L, 1L, 30L), (1L, 2L, 10L), (1L, 3L, 20L))
    val got = run(Seq(rows), windowMicros = 1000000L, n = 2)
    assert(got == batchRef(rows, 1000000L, 2))
    assert(got.map(_._1) == Set(2L, 3L))
  }

  test("bucket boundary: a new bucket restarts the count") {
    // NOT at ms=0: an event time ≤ the initial watermark (0) is dropped
    // by Spark's late-row filter before the stateful operator sees it —
    // the watermark contract, not an operator choice
    val rows = Seq((1L, 1L, 1001L), (1L, 2L, 1999L), (1L, 3L, 2000L), (1L, 4L, 2001L))
    val got = run(Seq(rows), windowMicros = 1000000L, n = 2)
    assert(got == batchRef(rows, 1000000L, 2))
    assert(got.size == 4)
  }
}
