package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r10 #8: the drain-sentinel pattern must survive MULTI-BATCH
  * processing, not just the default read-everything-in-one-micro-batch.
  * Since r11 the sentinel entries (a) size the watermark delay to the full
  * event-time span, so no interleaving of data files can make a row late,
  * and (b) order the sentinel file strictly LAST by mtime
  * (SparkEntry.writeDataThenSentinel), so the drain point is reached only
  * after every data file. This spec forces `maxFilesPerTrigger=1` — the
  * exact knife-edge the r9/r10 comments warned would silently drop rows —
  * and asserts parity with the single-batch run / the batch operator.
  */
class SentinelMultiBatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  private val sfDir = "/root/testdata/sf0.001"
  private def ready = new java.io.File(sfDir).isDirectory

  private def collectSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  /** Run a SparkEntry query with the given extra stream-read options. */
  private def runWith(name: String, opts: Map[String, String]): Set[String] = {
    SparkEntry.streamReadOptions = opts
    try collectSet(SparkEntry.queries(name)(spark, sfDir))
    finally SparkEntry.streamReadOptions = Map.empty
  }

  // Entry-level parity: the shipped streaming entries, file-per-trigger.
  // (sessionize = native session_window state; scd2 + rate_cap =
  // flatMapGroupsWithState with event-time timeouts; funnel = ordered
  // per-key fold — together they cover every stateful shape the sentinel
  // pattern drains.)
  // q_stream_asof adds the TWO-source case: the global watermark is the
  // min across both inputs' sentinels, each mtime-ordered last in its own
  // directory.
  // q_stream_interval_join has NO sentinel by design (inner-join matches
  // emit on arrival; the watermark only gates state eviction) — including
  // it here proves that claim under file-per-trigger processing too.
  // q_stream_interval_join_left adds the OUTER case: unmatched lefts emit
  // nulls only after the watermark passes their join window — the shape
  // most sensitive to per-file watermark progression.
  for (q <- Seq("q_stream_sessionize", "q_stream_funnel", "q_stream_rate_cap",
                "q_stream_scd2", "q_stream_asof", "q_stream_interval_join",
                "q_stream_interval_join_left", "q_stream_interval_join_full")) {
    test(s"$q: maxFilesPerTrigger=1 output equals the single-batch output") {
      assume(ready)
      val single = runWith(q, Map.empty)
      val multi = runWith(q, Map("maxFilesPerTrigger" -> "1"))
      assert(multi == single,
        s"multi-batch drain diverged: only-single=${(single -- multi).take(3)} " +
          s"only-multi=${(multi -- single).take(3)}")
      assert(single.nonEmpty, s"$q produced no rows at $sfDir")
    }
  }

  test("synthetic 8-file sessionize: one file per trigger matches the batch operator") {
    assume(ready)
    import org.apache.spark.sql.streaming.Trigger
    // 8 data part-files force ≥9 micro-batches under maxFilesPerTrigger=1,
    // with event times scattered across files (repartition is hash-random),
    // so earlier batches routinely carry LATER events — the exact shape
    // that dropped rows under the old 0-second delay.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val base = ev.select(col("user_id"), col("event_id"),
      timestamp_micros(SparkEntry.tsMicros(ev)).as("ts"))
    val (minUs, maxUs) = SparkEntry.eventTimeSpan(
      base, unix_micros(col("ts")), "events")
    val delayUs = maxUs - minUs + 1000000L
    val dir = java.nio.file.Files.createTempDirectory("sentinel_mb").toString
    SparkEntry.writeDataThenSentinel(
      base.repartition(8),
      spark.range(1).select(lit(-1L).as("user_id"), lit(-1L).as("event_id"),
        timestamp_micros(lit(maxUs + 2L * 86400L * 1000000L + delayUs)).as("ts")),
      dir)
    val files = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length >= 9, s"expected >= 9 part files, got ${files.length}")
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val agg = stream
      .withWatermark("ts", s"$delayUs microseconds")
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
    val qname = s"sentinel_mb_${System.nanoTime()}"
    agg.writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
    val streamed = collectSet(spark.table(qname).where(col("user_id") >= 0)
      .select("user_id", "n_events", "start_us", "end_us"))
    val batch = collectSet(operators.Sessionize.sessions(
        base.where(col("user_id") >= 0).withColumn("v", lit(0.0)),
        col("user_id"), col("event_id"), col("ts"), col("v"),
        gapSeconds = 8L * 3600L)
      .select("user_id", "n_events", "start_us", "end_us"))
    assert(streamed == batch,
      s"streamed sessions diverge from batch: only-stream=${(streamed -- batch).take(3)} " +
        s"only-batch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }
}
