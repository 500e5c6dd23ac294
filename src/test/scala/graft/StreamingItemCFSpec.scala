package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.streaming.StreamingOps

/** Pins the foreachBatch item-CF maintenance contract: a basket-atomic
  * feed drained through ANY microbatch split yields maintained state —
  * and therefore neighbors — equal to the one-shot batch computation.
  */
class StreamingItemCFSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("maintained neighbors == one-shot itemNeighbors across 3 microbatches") {
    // 30 baskets over 8 items, deterministic contents, plenty of shared
    // pairs; baskets assigned whole to one of three feed files
    val rows = for {
      bk <- 0L until 30L
      slot <- 0 until (bk % 4 + 2).toInt
    } yield (bk, ((bk * 7 + slot * slot + slot) % 8).toLong)
    val df = rows.toDF("bk", "it")
    val feedDir = tmp("itemcf-feed")
    val stateDir = tmp("itemcf-state")
    for (r <- 0 until 3)
      df.where($"bk" % 3 === r).coalesce(1).write.mode("append").parquet(feedDir)
    val feed = spark.readStream.schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    StreamingOps.maintainItemCF(feed, "bk", "it", stateDir).awaitTermination()
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"item".cast("long"), $"nbr".cast("long"), $"cooc".cast("long"),
          $"cos", $"rank")
        .as[(Long, Long, Long, Double, Int)].collect().toSet
    val maintained = canon(StreamingOps.itemCFFromState(spark, stateDir, k = 3, minPairs = 2))
    val oneShot = canon(Analytics.itemNeighbors(df, $"bk", $"it", k = 3, minPairs = 2))
    assert(maintained == oneShot)
    assert(maintained.nonEmpty)
  }

  test("colf-backed state (MERGE INTO) equals the parquet path and the one-shot") {
    val rows = for {
      bk <- 0L until 24L
      slot <- 0 until (bk % 3 + 2).toInt
    } yield (bk, ((bk * 5 + slot * 3 + slot * slot) % 7).toLong)
    val df = rows.toDF("bk", "it")
    val feedDir = tmp("itemcf-colf-feed")
    val stateDir = tmp("itemcf-colf-state") + "/s" // colf creates it
    for (r <- 0 until 3)
      df.where($"bk" % 3 === r).coalesce(1).write.mode("append").parquet(feedDir)
    val feed = spark.readStream.schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    StreamingOps.maintainItemCFColf(feed, "bk", "it", stateDir).awaitTermination()
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"item".cast("long"), $"nbr".cast("long"), $"cooc".cast("long"),
          $"cos", $"rank")
        .as[(Long, Long, Long, Double, Int)].collect().toSet
    val maintained = canon(StreamingOps.itemCFFromColfState(spark, stateDir, k = 3, minPairs = 2))
    val oneShot = canon(Analytics.itemNeighbors(df, $"bk", $"it", k = 3, minPairs = 2))
    assert(maintained == oneShot)
    assert(maintained.nonEmpty)
    // the state is a real, versioned colf table: batch 1 created v1 and
    // each later batch's MERGE committed a new version
    val pairsNow = spark.read.format("colf").load(s"$stateDir/pairs").count()
    assert(pairsNow > 0)
  }

  test("state is additive: a second maintenance run over extra baskets extends it") {
    val base = (0L until 10L).flatMap(bk => Seq((bk, 1L), (bk, 2L))).toDF("bk", "it")
    val extra = (10L until 20L).flatMap(bk => Seq((bk, 1L), (bk, 3L))).toDF("bk", "it")
    val stateDir = tmp("itemcf-state2")
    // ONE growing feed directory across both maintenance runs: the
    // checkpoint now lives inside stateDir (ADVICE r14 restart safety)
    // and pins the source path, so "more data later" arrives as new
    // files in the same feed — the natural streaming contract — and the
    // second run resumes the committed offset instead of re-reading
    // (re-counting) the first run's baskets.
    val fd = tmp("itemcf-feed2")
    def drain(d: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      d.coalesce(1).write.mode("append").parquet(fd)
      val feed = spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(fd)
      StreamingOps.maintainItemCF(feed, "bk", "it", dir).awaitTermination()
    }
    drain(base, stateDir)
    drain(extra, stateDir)
    val pairs = spark.read.parquet(s"$stateDir/pairs/cur")
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) from the first run, (1,3) from the second, both over item 1
    assert(pairs == Set((1L, 2L, 10L), (1L, 3L, 10L)))
    val items = spark.read.parquet(s"$stateDir/items/cur")
      .as[(Long, Long)].collect().toMap
    assert(items == Map(1L -> 20L, 2L -> 10L, 3L -> 10L))
  }

  test("restart with no new data is a no-op: checkpoint resume, no double count") {
    // ADVICE r14: without a checkpointLocation a restarted query
    // re-read the ENTIRE feed and double-counted every basket into the
    // surviving state. Now the checkpoint rides inside stateDir: a
    // second drain over the same feed resumes the committed offset,
    // sees nothing new, and the counts are bit-identical.
    val df = (0L until 6L).flatMap(bk => Seq((bk, 1L), (bk, 2L))).toDF("bk", "it")
    val fd = tmp("itemcf-feed3")
    val stateDir = tmp("itemcf-state3")
    df.coalesce(1).write.mode("append").parquet(fd)
    def drain(): Unit = {
      val feed = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(fd)
      StreamingOps.maintainItemCF(feed, "bk", "it", stateDir).awaitTermination()
    }
    drain()
    val first = spark.read.parquet(s"$stateDir/pairs/cur")
      .as[(Long, Long, Long)].collect().toSet
    assert(first == Set((1L, 2L, 6L)))
    drain() // restart: nothing new committed, state must not move
    val second = spark.read.parquet(s"$stateDir/pairs/cur")
      .as[(Long, Long, Long)].collect().toSet
    assert(second == first, "restarted drain double-counted the feed")
    // the swap protocol left no transient directories behind
    val leftovers = new java.io.File(s"$stateDir/pairs").listFiles().map(_.getName).toSet
    assert(leftovers == Set("cur"), s"unexpected state dirs: $leftovers")
  }
}
