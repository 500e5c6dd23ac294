package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.streaming.StreamingOps

/** Streaming as-of (temporal) join: watermark-finalized latest-right
  * enrichment with bounded per-key state, agreeing with the batch
  * operator on the same data once all events are inside the watermark.
  */
class StreamingAsOfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkStreams() = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, String)]
    val lefts = lMem.toDS().toDF("k", "t", "lv").withWatermark("t", "0 seconds")
    val rights = rMem.toDS().toDF("k", "rt", "rv").withWatermark("rt", "0 seconds")
    (lMem, rMem, StreamingOps.asOfJoinStream(lefts, rights, Seq("k"), "t", "rt"))
  }

  test("streaming as-of join matches the batch operator across microbatches") {
    val (lMem, rMem, joined) = mkStreams()
    val qname = s"stream_asof_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    def step(): Unit = q.processAllAvailable()
    try {
      // batch 1: right state arrives first, then a left event after it.
      // Watermark is still behind the left, so NOTHING emits yet.
      rMem.addData((1L, ts("2024-01-01 10:00:00"), "x")); step()
      lMem.addData((1L, ts("2024-01-01 10:00:05"), "a")); step()
      assert(spark.table(qname).isEmpty, "left must buffer until the watermark passes it")

      // batch 2: both watermarks advance past 10:00:05 → "a" finalizes
      // against the latest right at-or-before it
      rMem.addData((1L, ts("2024-01-01 10:00:10"), "y"))
      lMem.addData((1L, ts("2024-01-01 10:00:12"), "b")); step()
      val after2 = spark.table(qname).collect()
        .map(r => (r.getString(2), r.getString(4))).toSet
      assert(after2 == Set(("a", "x")), s"got $after2")

      // later batches: "b" flushes against "y"; "c" matches "y"; an
      // unmatched key emits null right columns
      lMem.addData((1L, ts("2024-01-01 10:01:00"), "c"), (7L, ts("2024-01-01 10:01:00"), "z"))
      rMem.addData((1L, ts("2024-01-01 10:02:00"), "w")); step()
      lMem.addData((1L, ts("2024-01-01 10:03:00"), "d"))
      rMem.addData((1L, ts("2024-01-01 10:03:30"), "v")); step()
      lMem.addData((9L, ts("2024-01-01 10:04:00"), "end"))
      rMem.addData((9L, ts("2024-01-01 10:04:00"), "rend")); step()

      val got = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getString(2), Option(r.getString(4)))).toSet
      // batch reference over the SAME events (all now inside the watermark)
      val lAll = Seq(
        (1L, ts("2024-01-01 10:00:05"), "a"), (1L, ts("2024-01-01 10:00:12"), "b"),
        (1L, ts("2024-01-01 10:01:00"), "c"), (7L, ts("2024-01-01 10:01:00"), "z"),
        (1L, ts("2024-01-01 10:03:00"), "d")).toDF("k", "t", "lv")
      val rAll = Seq(
        (1L, ts("2024-01-01 10:00:00"), "x"), (1L, ts("2024-01-01 10:00:10"), "y"),
        (1L, ts("2024-01-01 10:02:00"), "w"), (1L, ts("2024-01-01 10:03:30"), "v"))
        .toDF("k", "rt", "rv")
      val ref = AsOfJoin.asOfJoin(lAll, rAll, Seq("k"), "t", "rt", "left")
        .collect().map(r => (r.getLong(0), r.getString(2), Option(r.getString(4)))).toSet
      // the 10:04 events only advanced the watermark; 'end' itself may
      // still be pending, so compare on the reference's lefts
      assert(ref.subsetOf(got), s"missing ${ref -- got} in $got")
      assert((got -- ref).forall(_._2 == "end"), s"unexpected extras ${got -- ref}")
      // streaming output schema == batch output schema
      assert(joined.schema.fieldNames.toSeq ==
        AsOfJoin.asOfJoin(lAll, rAll, Seq("k"), "t", "rt", "left").schema.fieldNames.toSeq)
    } finally q.stop()
  }

  test("timeout flushes buffered lefts for keys that never see another row") {
    val (lMem, rMem, joined) = mkStreams()
    val qname = s"stream_asof_to_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      rMem.addData((5L, ts("2024-01-01 09:59:00"), "r5"))
      lMem.addData((5L, ts("2024-01-01 10:00:00"), "only")); q.processAllAvailable()
      assert(spark.table(qname).isEmpty)
      // key 5 never appears again; OTHER keys push the watermark forward
      // and the event-time timeout flushes it
      lMem.addData((6L, ts("2024-01-01 10:10:00"), "mover"))
      rMem.addData((6L, ts("2024-01-01 10:10:00"), "rm")); q.processAllAvailable()
      val got = spark.table(qname).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(4)))
      assert(got.exists(r => r._1 == 5L && r._2 == "only" && r._3 == "r5"),
        s"timeout must flush the buffered left, got ${got.toSeq}")
    } finally q.stop()
  }
}
