package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf.ColfCatalog

/** Streaming change feed (`readChangeFeed`): micro batches emit row-level
  * inserts AND deletes per manifest version — the CDC surface for tables
  * mutated by merge-on-read DML, where the append-only source must
  * refuse. Offsets are versions, so checkpointed restarts resume at the
  * next unconsumed commit.
  */
class ColfChangeFeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkTest.session
    s.conf.set("spark.sql.catalog.colf_cdf", classOf[ColfCatalog].getName)
    s
  }
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_cdf_test").toString

  /** Drain the feed with AvailableNow into a parquet sink (it supports
    * checkpoint RECOVERY, unlike the memory sink — restarts are exactly
    * what this spec exercises); returns the sink's CUMULATIVE
    * (k, v, _change_type, _commit_version) rows.
    */
  private def drain(dir: String, ckpt: String, out: String,
      extraOpts: Map[String, String] = Map.empty): Set[(Int, String, String, Int)] = {
    var r = spark.readStream.format("colf").option("readChangeFeed", "true")
    extraOpts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out)
      .select("k", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
  }

  test("feed emits inserts and deletes per version across DV growth, full masks, rewrites") {
    val dir = tmp() + "/t"
    val ckpt = tmp() + "/ckpt"
    def append(rows: (Int, String)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1).write.format("colf")
        .option("manifest", "true").mode("append").save(dir)
    append((1, "a"), (2, "b"))                     // v1: file A
    append((3, "c"), (4, "d"))                     // v2: file B
    spark.conf.set("spark.colf.dml.mode", "merge-on-read")
    try {
      spark.sql(s"DELETE FROM colf_cdf.`$dir` WHERE k = 1")  // v3: DV on A
      spark.sql(s"DELETE FROM colf_cdf.`$dir` WHERE k >= 3") // v4: B fully masked → entry dropped
    } finally spark.conf.unset("spark.colf.dml.mode")
    spark.sql(s"UPDATE colf_cdf.`$dir` SET v = 'B' WHERE k = 2") // v5: CoW replaces A

    val out = tmp() + "/out"
    val first = drain(dir, ckpt, out)
    val got = first.groupBy(_._4).view
      .mapValues(_.map(r => (r._1, r._2, r._3))).toMap
    assert(got(1) == Set((1, "a", "insert"), (2, "b", "insert")))
    assert(got(2) == Set((3, "c", "insert"), (4, "d", "insert")))
    // DV growth: exactly the newly-masked row, full content, as a delete
    assert(got(3) == Set((1, "a", "delete")))
    // fully-masked file leaves the manifest: only its LIVE rows retract
    assert(got(4) == Set((3, "c", "delete"), (4, "d", "delete")))
    // CoW rewrite: old row (k=1 already dead — NOT re-retracted) out, new in
    assert(got(5) == Set((2, "b", "delete"), (2, "B", "insert")))

    // checkpointed restart: only new commits appear
    append((5, "e"))                               // v6
    val second = drain(dir, ckpt, out)
    assert(second -- first == Set((5, "e", "insert", 6)))
    // a third drain with nothing new emits nothing
    assert(drain(dir, ckpt, out) == second)
  }

  test("feed crosses schema evolution: pre-ADD rows read the new column as null") {
    val dir = tmp() + "/t"
    spark.sql(s"CREATE TABLE colf_cdf.`$dir` (k INT, v STRING)")           // v1
    spark.sql(s"INSERT INTO colf_cdf.`$dir` VALUES (1, 'a')")              // v2
    spark.sql(s"ALTER TABLE colf_cdf.`$dir` ADD COLUMN score DOUBLE")      // v3 (no entries change)
    spark.sql(s"INSERT INTO colf_cdf.`$dir` VALUES (2, 'b', 1.5)")         // v4
    val out = tmp() + "/out"
    val q = spark.readStream.format("colf").option("readChangeFeed", "true")
      .load(dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmp() + "/ck")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .select("k", "score", "_change_type", "_commit_version").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2), r.getInt(3))).toSet
    // v3 (pure DDL) emits nothing; the v2 row reads score as null
    assert(got == Set((1, None, "insert", 2), (2, Some(1.5), "insert", 4)))
  }

  test("startingVersion skips history; guards reject misuse") {
    val dir = tmp() + "/t"
    Seq((1, "a")).toDF("k", "v").coalesce(1).write.format("colf")
      .option("manifest", "true").mode("append").save(dir)
    Seq((2, "b")).toDF("k", "v").coalesce(1).write.format("colf")
      .mode("append").save(dir)
    val got = drain(dir, tmp() + "/ck", tmp() + "/out", Map("startingVersion" -> "2"))
    assert(got == Set((2, "b", "insert", 2)))

    // batch read of a change feed: loud rejection with the batch alternative
    val batch = intercept[Exception] {
      spark.read.format("colf").option("readChangeFeed", "true").load(dir).collect()
    }
    assert(batch.getMessage.contains("diffVersions") ||
      Option(batch.getCause).exists(_.getMessage.contains("diffVersions")))
    // unversioned table: no manifests to follow
    val flat = tmp() + "/flat"
    Seq((1, "a")).toDF("k", "v").write.format("colf").mode("append").save(flat)
    val unv = intercept[Exception] { drain(flat, tmp() + "/ck2", tmp() + "/out2") }
    assert(unv.getMessage.contains("VERSIONED") ||
      Option(unv.getCause).exists(_.getMessage.contains("VERSIONED")))
  }

  test("append-only source still rejects DV tables, pointing at the feed") {
    val dir = tmp() + "/t"
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1).write.format("colf")
      .option("manifest", "true").mode("append").save(dir)
    spark.conf.set("spark.colf.dml.mode", "merge-on-read")
    try spark.sql(s"DELETE FROM colf_cdf.`$dir` WHERE k = 1")
    finally spark.conf.unset("spark.colf.dml.mode")
    val e = intercept[Exception] {
      val q = spark.readStream.format("colf").load(dir)
        .writeStream.format("memory").queryName("cdf_plain_reject")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("readChangeFeed")))
  }
}
