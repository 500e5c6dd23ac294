package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming ordered funnel: per-user deepest in-order step with
  * watermark-bounded state, agreeing with the batch funnel's frontier
  * semantics across microbatch boundaries.
  */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  private def run(batches: Seq[Seq[(Long, String, Long)]],
                  steps: Seq[String] = Seq("a", "b", "c")): Map[Long, Int] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long)]
    val df = mem.toDS().toDF("u", "et", "t", "us").withWatermark("t", "0 seconds")
    val out = StreamingOps.funnelStream(df, "u", "et", "t", "us", steps)
    val qname = s"stream_funnel_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (u, et, ms) => (u, et, ts(ms), ms * 1000L) })
        q.processAllAvailable()
      }
      // drain sentinel: one far-future event pushes the watermark past
      // everything, then one more batch fires the timeouts
      mem.addData((-1L, steps.head, ts(10000000L), 10000000L * 1000L))
      q.processAllAvailable()
      mem.addData((-1L, steps.head, ts(20000000L), 20000000L * 1000L))
      q.processAllAvailable()
      // depth rows are emitted per increase — final depth is the max
      spark.table(qname).where(col("user_id") >= 0)
        .groupBy("user_id").agg(max("deepest").as("deepest")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    } finally q.stop()
  }

  test("single-batch funnel matches the batch frontier semantics") {
    val out = run(Seq(Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L), // full depth
      (2L, "b", 5L), (2L, "a", 10L), (2L, "c", 20L),  // b before a: depth 1
      (3L, "a", 10L),                                 // depth 1
      (4L, "b", 10L), (4L, "c", 20L))))               // never did a: no row
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("state carries conversions across microbatches") {
    // u1's steps arrive one per batch, in order, each batch advancing the
    // watermark — the frontier must persist between batches
    val out = run(Seq(
      Seq((1L, "a", 10L)),
      Seq((1L, "b", 20L)),
      Seq((1L, "c", 30L))))
    assert(out == Map(1L -> 3))
  }

  test("same-timestamp step does not advance (strict after), across batches") {
    val out = run(Seq(
      Seq((1L, "a", 10L), (1L, "b", 10L)),
      Seq((2L, "a", 40L)), Seq((2L, "b", 41L))))
    assert(out == Map(1L -> 1, 2L -> 2))
  }

  test("out-of-order arrival WITHIN a batch folds by event time") {
    // c then b then a in arrival order, but event times are in funnel
    // order — the in-batch sort must recover depth 3
    val out = run(Seq(Seq((1L, "c", 30L), (1L, "b", 20L), (1L, "a", 10L))))
    assert(out == Map(1L -> 3))
  }
}
