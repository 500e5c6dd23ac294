package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.streaming.StreamingOps

/** Streaming SCD2 maintenance: closed intervals emit in-stream, idle
  * keys flush as current via the event-time timeout, and the drained
  * output equals the batch scd2 build.
  */
class StreamingScd2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  /** Changes are (key, attr, eventTimeMs); returns
    * (k, from_us, to_us|-1, is_current, attr) after a sentinel drain.
    */
  private def run(batches: Seq[Seq[(Long, String, Long)]],
                  horizonUs: Long): Set[(Long, Long, Long, Boolean, String)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long, Long)]
    val df = mem.toDS().toDF("k", "attr", "t", "us", "eid")
      .withWatermark("t", "0 seconds")
    val out = StreamingOps.scd2Stream(df, "k", "t", "us", "eid",
      Seq("attr"), horizonUs)
    val qname = s"stream_scd2_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      var eid = 0L
      batches.foreach { b =>
        mem.addData(b.map { case (k, a, ms) => eid += 1; (k, a, ts(ms), ms * 1000L, eid) })
        q.processAllAvailable()
      }
      mem.addData((-1L, "x", ts(10000000L), 10000000L * 1000L, -1L))
      q.processAllAvailable()
      mem.addData((-1L, "x", ts(20000000L), 20000000L * 1000L, -2L))
      q.processAllAvailable()
      spark.table(qname).where(col("k") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
          r.getString(4))).toSet
    } finally q.stop()
  }

  test("drained single-batch stream equals the batch scd2 build") {
    val changes = Seq((1L, "A", 10L), (1L, "B", 20L), (1L, "C", 20L),
      (2L, "X", 5L), (3L, "Z", 7L))
    val got = run(Seq(changes), horizonUs = 3600L * 1000000L)
    val batch = Analytics.scd2(
        changes.zipWithIndex.map { case ((k, a, ms), i) =>
          (k, a, ms * 1000L, i + 1L) }.toDF("k", "attr", "tus", "eid"),
        col("k"), col("tus"), col("eid"), Seq("attr" -> col("attr")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
        r.getString(4))).toSet
    assert(got == batch)
  }

  test("versions closed in an early batch emit before the stream drains") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long, Long)]
    val df = mem.toDS().toDF("k", "attr", "t", "us", "eid")
      .withWatermark("t", "0 seconds")
    val out = StreamingOps.scd2Stream(df, "k", "t", "us", "eid",
      Seq("attr"), closeHorizonMicros = 3600L * 1000000L)
    val qname = s"stream_scd2_early_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      mem.addData((1L, "A", ts(10L), 10000L, 1L), (1L, "B", ts(20L), 20000L, 2L))
      q.processAllAvailable()
      // advance the watermark WITHOUT draining past the horizon: the
      // A-version closes, B stays open in state
      mem.addData((9L, "w", ts(1000L), 1000000L, 3L))
      q.processAllAvailable()
      mem.addData((9L, "w", ts(2000L), 2000000L, 4L))
      q.processAllAvailable()
      val mid = spark.table(qname).where(col("k") === 1L).collect()
        .map(r => (r.getLong(1), r.isNullAt(2), r.getString(4))).toSet
      assert(mid == Set((10000L, false, "A")), s"closed A-version must be out early, got $mid")
    } finally q.stop()
  }

  test("in-order gap past the horizon flushes a currency snapshot, then reopens") {
    // horizon 100ms: A@10ms flushes as current once the watermark drifts
    // past 110ms with nothing pending; B@3000ms then opens a FRESH chain.
    // The flushed row stays (append sinks cannot retract) — the
    // documented snapshot semantic, pinned so it stays deliberate.
    val got = run(Seq(
      Seq((1L, "A", 10L)),
      Seq((9L, "w", 1000L)), Seq((9L, "w", 2000L)),   // advance wm, fire timeout
      Seq((1L, "B", 3000L))), horizonUs = 100L * 1000L)
    val key1 = got.filter(_._1 == 1L)
    assert(key1 == Set((1L, 10000L, -1L, true, "A"), (1L, 3000000L, -1L, true, "B")),
      s"expected the A snapshot + fresh B chain, got $key1")
  }

  test("cross-batch chaining matches batch (changes split across batches)") {
    val all = Seq((1L, "A", 10L), (1L, "B", 500L), (1L, "C", 900L))
    val got = run(Seq(all.take(1), all.slice(1, 2), all.drop(2)),
      horizonUs = 3600L * 1000000L)
    val batch = Analytics.scd2(
        all.zipWithIndex.map { case ((k, a, ms), i) => (k, a, ms * 1000L, i + 1L) }
          .toDF("k", "attr", "tus", "eid"),
        col("k"), col("tus"), col("eid"), Seq("attr" -> col("attr")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
        r.getString(4))).toSet
    assert(got == batch)
  }
}
