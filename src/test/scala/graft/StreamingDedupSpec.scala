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
}
