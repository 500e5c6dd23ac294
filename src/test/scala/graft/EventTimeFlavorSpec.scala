package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's event-time handling to EVERY physical parquet flavor
  * the `events.ts` column has shipped in (round-8 regression: the upstream
  * generator switched from TIMESTAMP(NANOS) — read as INT64 under
  * `spark.sql.legacy.parquet.nanosAsLong` — to TIMESTAMP_MICROS/NTZ, and
  * six hard-coded-flavor queries died at analysis). The same logical events
  * table is written three ways; every event-time query in `SparkEntry`
  * must analyze AND return identical results on all three:
  *
  *  - `nanos_long`: plain INT64 nanos-since-epoch — the exact observed
  *    schema the legacy nanosAsLong read of TIMESTAMP(NANOS) produces
  *    (Spark cannot author TIMESTAMP(NANOS) parquet itself, so the spec
  *    writes the post-read representation, which is what the adaptive
  *    branch in `SparkEntry.tsMicros` dispatches on);
  *  - `ts_ntz`: TIMESTAMP_NTZ (parquet TIMESTAMP_MICROS, isAdjustedToUTC
  *    false) — what the driver ships today;
  *  - `ts_utc`: instant-semantics TIMESTAMP.
  *
  * Also asserts `withWatermark` works directly on a TIMESTAMP_NTZ stream
  * (supported since Spark 3.4 — the streaming entries rely on it being
  * safe to normalize through, so pin it).
  */
class EventTimeFlavorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  /** 2024-01-01 00:00:00 UTC in micros. */
  private val base = 1704067200000000L

  /** Canonical logical table: 240 events over 5 users, 3-hour stride with
    * sub-second jitter (so per-user gaps straddle the 8-hour sessionize
    * boundary), ~1/4 purchases (feeds the as-of right side), JSON props.
    */
  private def logical: DataFrame =
    spark.range(240).select(
      $"id".as("event_id"),
      (lit(base) + $"id" * (3L * 3600 * 1000000) + ($"id" % 7) * 123456L).as("us"),
      ($"id" % 5).as("user_id"),
      when($"id" % 4 === 0, lit("purchase"))
        .otherwise(concat(lit("view"), ($"id" % 3).cast("string"))).as("event_type"),
      ($"id" * 15 % 97).cast("double").as("value"),
      concat(lit("{\"k\":\""), ($"id" % 10).cast("string"), lit("\"}")).as("props"))

  private def mkDir(flavor: String): String = {
    val dir = s"/tmp/graft_test/etflavor_$flavor"
    val df = logical
    val withTs = flavor match {
      case "nanos_long" => df.withColumn("ts", $"us" * 1000L)
      case "ts_ntz"     => df.withColumn("ts", timestamp_micros($"us").cast("timestamp_ntz"))
      case "ts_utc"     => df.withColumn("ts", timestamp_micros($"us"))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("nanos_long", "ts_ntz", "ts_utc").map(f => f -> mkDir(f)).toMap

  test("the three flavors decode to the intended Spark types") {
    assert(spark.read.parquet(s"${dirs("nanos_long")}/events.parquet")
      .schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"${dirs("ts_ntz")}/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"${dirs("ts_utc")}/events.parquet")
      .schema("ts").dataType == TimestampType)
  }

  private val eventTimeQueries = Seq(
    "q_events_window", "q_sessionize", "q_json_extract",
    "q_asof_join", "q_stream_window", "q_stream_asof", "q_stream_sessionize")

  for (name <- eventTimeQueries)
    test(s"$name agrees across all ts flavors") {
      val results = dirs.map { case (flavor, dir) =>
        flavor -> SparkEntry.queries(name)(spark, dir)
          .collect().map(_.toString).sorted.toSeq
      }
      val ref = results("ts_ntz")
      assert(ref.nonEmpty, s"$name returned no rows on the tiny flavor table")
      for ((flavor, rows) <- results)
        assert(rows == ref,
          s"$name: flavor $flavor diverges from ts_ntz " +
            s"(${rows.size} vs ${ref.size} rows)")
    }

  /** Micros-level event-time queries (outputs are epoch-micros longs and
    * ids — no timestamp RENDERING, which legitimately follows session tz).
    */
  private val microsLevelQueries = Seq("q_asof_join", "q_sessionize")

  test("event-time micros are session-timezone-independent (verdict r9 #5)") {
    // tsMicros used to reinterpret NTZ via cast(TimestampType), which is
    // exact only under the harness's UTC session pin — a non-UTC session
    // shifted every event time by the zone offset. The field-extraction
    // form has no session-tz dependence at all; prove it by running the
    // micros-level queries under UTC and under two non-UTC zones (one
    // negative offset with DST, one positive without) on EVERY flavor and
    // requiring identical rows.
    val utcResults = (for {
      name <- microsLevelQueries; (flavor, dir) <- dirs
    } yield (name, flavor) ->
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq).toMap
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("America/New_York", "Asia/Tokyo")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        for { name <- microsLevelQueries; (flavor, dir) <- dirs } {
          val rows = SparkEntry.queries(name)(spark, dir)
            .collect().map(_.toString).sorted.toSeq
          assert(rows == utcResults((name, flavor)),
            s"$name on flavor $flavor shifts under session tz $tz")
          assert(rows.nonEmpty, s"$name returned no rows under tz $tz")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("NTZ field extraction is exact over the full micros range, incl. pre-1970") {
    // tsMicros's NTZ branch reconstructs micros from wall-clock fields
    // (unix_date/hour/minute/second). Pin exactness against the ground
    // truth across awkward values: negative epochs (wall digits before
    // 1970 — unix_date is negative while the time-of-day part is still
    // positive), sub-second micros, second boundaries, DST-hole wall
    // times, far past/future. Ground truth: the micros each NTZ was
    // BUILT from (timestamp_micros under the UTC session, then cast).
    val samples: Seq[Long] = Seq(
      0L, 1L, -1L, 999999L, -999999L, 1000000L, -1000000L,
      1704067200123456L,            // 2024-01-01 00:00:00.123456
      -86400000000L,                // 1969-12-31
      -86399999999L,                // 1969-12-31 00:00:00.000001
      -62135596800000000L,          // year 1
      253402300799999999L,          // 9999-12-31 23:59:59.999999
      1710037800000000L,            // inside the US DST spring-forward hole
      1730597400000000L             // inside the US DST fall-back overlap
    ) ++ (1 to 50).map(i => i * 1234567891234L - 30000000000000L)
    val df = samples.toDF("us")
      .select($"us", timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Kathmandu")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val bad = df.select($"us", SparkEntry.tsMicros(df).as("got"))
          .where($"us" =!= $"got").collect()
        assert(bad.isEmpty,
          s"tz=$tz: field extraction diverges at ${bad.take(3).mkString(", ")}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("NTZ watermark is rejected by this Spark build — normalization is mandatory") {
    // Empirical pin: Spark 4.1.2 refuses withWatermark on TIMESTAMP_NTZ
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the streaming entries MUST
    // normalize event time to instant-semantics TIMESTAMP first (which
    // `SparkEntry.events()` / the t_us→timestamp_millis path do). If a
    // Spark upgrade starts accepting NTZ here, this test fails and the
    // normalization becomes optional — re-evaluate then.
    val path = s"${dirs("ts_ntz")}/events.parquet"
    val schema = spark.read.parquet(path).schema
    assert(schema("ts").dataType == TimestampNTZType)
    val ntzErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.readStream.schema(schema).parquet(path)
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour")).count()
        .writeStream.format("memory")
        .queryName(s"graft_ntz_wm_${System.nanoTime()}")
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    }
    assert(ntzErr.getCondition == "EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE")

    // …and the normalized TIMESTAMP path streams fine on the same file.
    val agg = spark.readStream.schema(schema).parquet(path)
      .withColumn("ts", $"ts".cast(TimestampType))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour")).count()
    val qn = s"graft_ts_wm_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qn)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(qn).count() > 0)
  }
}
