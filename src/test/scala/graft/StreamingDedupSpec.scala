package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("flatMapGroupsWithState dedup emits exactly one row per key across batches") {
    val inDir = Files.createTempDirectory("stream_dedup").toString
    // two files → up to two microbatches; key 2 and 3 repeat across them
    Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(inDir)
    Seq((2L, "b"), (3L, "c"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(inDir)

    val stream = spark.readStream.schema("id LONG, v STRING")
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .as[(Long, String)]
    val deduped = StreamingOps.firstPerKey(stream, (r: (Long, String)) => r._1)

    val qname = s"stream_dedup_${System.nanoTime()}"
    // maxFilesPerTrigger=1 forces one file per microbatch, so cross-batch
    // state suppression is genuinely exercised, not just in-batch take(1)
    val q = deduped.toDF("id", "v").writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table(qname).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // matches the batch semantics of dropDuplicates on the key
    val batchKeys = spark.read.parquet(inDir).dropDuplicates("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got.map(_._1).sorted.toSeq == batchKeys)
  }

  test("incremental dedup composes per micro-batch against a static corpus") {
    // The continuous-ingestion deployment shape: the STATIC corpus is
    // classified against by every arriving micro-batch via foreachBatch —
    // incrementalDedup is deterministic per batch and the corpus side is
    // reusable, so streaming results equal the one-shot batch run.
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "spark reads the columnar table and scans only the blocks it needs for the plan"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank at dawn today"),
    ).toDF("doc_id", "text")
    val inDir = Files.createTempDirectory("stream_incdedup").toString
    val batch1 = Seq(
      (100L, "spark reads the columnar table and scans only the blocks it needs for the plan"),
      (101L, "cooking pasta with fresh basil tomato sauce and a pinch of sea salt tonight"))
    val batch2 = Seq(
      (102L, "the quick brown fox jumps over the lazy dog near the river bank at dusk today"))
    batch1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    batch2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)

    val p = Dedup.MinHashParams(bands = 8, rowsPerBand = 4, jaccardThreshold = 0.4)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Option[Long])]
    val q = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (delta: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = Dedup.incrementalDedup(corpus, col("doc_id"), col("text"),
          delta, col("doc_id"), col("text"), p)
        acc.synchronized {
          acc ++= r.collect().map(x =>
            (x.getLong(0), x.getString(1), if (x.isNullAt(2)) None else Some(x.getLong(2))))
        }
        ()
      }.start()
    q.awaitTermination()

    val streamed = acc.sortBy(_._1).toSeq
    val batch = Dedup.incrementalDedup(corpus, col("doc_id"), col("text"),
        (batch1 ++ batch2).toDF("doc_id", "text"), col("doc_id"), col("text"), p)
      .collect().map(x =>
        (x.getLong(0), x.getString(1), if (x.isNullAt(2)) None else Some(x.getLong(2))))
      .sortBy(_._1).toSeq
    assert(streamed == batch)
    assert(streamed.map(t => t._1 -> t._2) ==
      Seq(100L -> "exact", 101L -> "novel", 102L -> "near"))
  }

  test("firstPerKeyExpiring ages state out past the event-time horizon") {
    // Horizon 10s, watermark delay 0: a key seen once is suppressed while
    // the watermark stays inside its horizon, then FORGOTTEN (and
    // re-emittable) once the watermark passes last-sighting + horizon.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String): Timestamp = Timestamp.valueOf(s)

    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDS().toDF("id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
    val deduped = StreamingOps.firstPerKeyExpiring(
      events, (r: (Long, Timestamp)) => r._1, (r: (Long, Timestamp)) => r._2.getTime,
      horizonMs = 10000L)

    val qname = s"stream_dedup_exp_${System.nanoTime()}"
    val q = deduped.toDF("id", "ts").writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    def batch(rows: (Long, Timestamp)*): Unit = { mem.addData(rows); q.processAllAvailable() }
    try {
      batch((1L, ts("2024-01-01 10:00:00")))                                   // 1 emitted; wm → 10:00:00
      batch((1L, ts("2024-01-01 10:00:05")), (2L, ts("2024-01-01 10:00:05")))  // 1 suppressed, 2 emitted; wm → 10:00:05
      batch((9L, ts("2024-01-01 10:05:00")))                                   // wm at processing 10:00:05 < timeouts; wm → 10:05:00
      batch((8L, ts("2024-01-01 10:06:00")))                                   // wm 10:05:00 > both timeouts ⇒ keys 1,2 expire
      batch((1L, ts("2024-01-01 10:06:30")))                                   // state gone ⇒ 1 EMITTED AGAIN
      val got = spark.table(qname).collect().map(_.getLong(0)).toSeq
      assert(got.count(_ == 1L) == 2, s"key 1 should re-emit after expiry, got $got")
      assert(got.count(_ == 2L) == 1)
      assert(got.sorted == Seq(1L, 1L, 2L, 8L, 9L))
    } finally q.stop()
  }
}
