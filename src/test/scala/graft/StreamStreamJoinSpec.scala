package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream inner join with watermarks + an event-time range bound —
  * the state-bounded join shape (each side's state is purged once the
  * watermark passes the range), drained with AvailableNow and compared
  * against the batch join on the same data.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream join within a time range matches the batch join") {
    val clicksDir = Files.createTempDirectory("ss_clicks").toString
    val buysDir = Files.createTempDirectory("ss_buys").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:10:00")),
      (3L, ts("2024-01-01 01:00:00")),
    ).toDF("user_id", "click_ts").write.mode("overwrite").parquet(clicksDir)
    Seq(
      (1L, ts("2024-01-01 00:04:00"), 10.0),  // 4 min after click: joins
      (2L, ts("2024-01-01 00:40:00"), 20.0),  // 30 min after: outside range
      (3L, ts("2024-01-01 01:02:00"), 30.0),  // 2 min after: joins
      (4L, ts("2024-01-01 02:00:00"), 40.0),  // no click at all
    ).toDF("user_id", "buy_ts", "amount").write.mode("overwrite").parquet(buysDir)

    def clicks(stream: Boolean) =
      (if (stream) spark.readStream.schema("user_id LONG, click_ts TIMESTAMP").parquet(clicksDir)
       else spark.read.parquet(clicksDir))
    def buys(stream: Boolean) =
      (if (stream) spark.readStream.schema("user_id LONG, buy_ts TIMESTAMP, amount DOUBLE").parquet(buysDir)
       else spark.read.parquet(buysDir))

    def joined(c: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      c.join(b, Seq("user_id")) // attribution: buy within 10 min after the click
        .where(col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("user_id"), col("amount"))

    val qname = s"ss_join_${System.nanoTime()}"
    val q = joined(
        clicks(stream = true).withWatermark("click_ts", "1 hour"),
        buys(stream = true).withWatermark("buy_ts", "1 hour"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streaming = spark.table(qname).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = joined(clicks(stream = false), buys(stream = false)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(batch == Set((1L, 10.0), (3L, 30.0)))
    assert(streaming == batch)
  }
}
