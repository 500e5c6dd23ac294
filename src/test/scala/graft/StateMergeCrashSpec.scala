package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Crash-schedule pins for the bucketed count-state swap protocol
  * (StreamingOps.mergeCountState): the r17 swap moves untouched buckets
  * by rename AFTER publishing next as cur, so there are new cut points —
  * each must reconstruct either the exact pre-batch state (the
  * uncommitted batch replays) or the exact post-batch state (the marker
  * says applied, replay is a no-op). Simulated by building the real
  * before/after states, then restoring crash layouts from copies and
  * re-running the merge.
  */
class StateMergeCrashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def copyDir(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).iterator().asScala.foreach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def rm(dir: String): Unit =
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()

  private def rows(dir: String): Set[(Long, Long)] =
    spark.read.parquet(s"$dir/cur").select("k", "n")
      .as[(Long, Long)].collect().toSet

  private def delta(kvs: (Long, Long)*) = kvs.toDF("k", "dn")

  test("every swap cut point reconstructs pre- or post-batch state exactly") {
    val gateBefore = StreamingOps.BucketStateMinBytes
    StreamingOps.BucketStateMinBytes = 0L
    try {
      val work = tmp("state-crash")
      val live = s"$work/live"
      // batch 0 (flat) + batch 1 (migrates to buckets) -> bucketed S1
      StreamingOps.mergeCountState(live, Seq("k"), delta((1L, 1L), (2L, 1L), (5L, 1L)), 0L)
      StreamingOps.mergeCountState(live, Seq("k"),
        delta((0L until 40L).map(k => (k, 2L)): _*), 1L)
      val s1 = s"$work/s1"; copyDir(live, s1)
      assert(new java.io.File(s"$live/cur").listFiles()
        .exists(_.getName.startsWith("bucket=")), "fixture: state must be bucketed")
      // batch 2 (touches only k=5's bucket) -> expected post state S2
      val d2 = delta((5L, 10L))
      StreamingOps.mergeCountState(live, Seq("k"), d2, 2L)
      val expected = rows(live)
      val s2 = s"$work/s2"; copyDir(live, s2)
      assert(expected.contains((5L, 13L))) // 1 + 2 + 10

      // cut A: crash BETWEEN the two renames — old holds pre-batch, no
      // cur; the batch was never committed, so it replays
      val a = s"$work/a"
      copyDir(s"$s1/cur", s"$a/old")
      StreamingOps.mergeCountState(a, Seq("k"), d2, 2L)
      assert(rows(a) == expected, "restore-then-replay diverged from the clean run")

      // cut B: crash MID-BUCKET-MOVE — next already published as cur
      // (touched buckets + marker), old still holds everything; recovery
      // must complete the move and then treat the replay as applied
      val b = s"$work/b"
      copyDir(s"$s2/cur", s"$b/cur")
      copyDir(s"$s1/cur", s"$b/old")
      val curBuckets = new java.io.File(s"$b/cur").listFiles()
        .filter(_.getName.startsWith("bucket=")).map(_.getName)
      // delete two buckets NOT holding k=5 from cur: "not yet moved"
      val touched = spark.range(1)
        .selectExpr(s"cast(pmod(hash(5L), ${StreamingOps.StateBuckets}) as int)")
        .as[Int].head()
      val notMoved = curBuckets.filter(_ != s"bucket=$touched").take(2)
      assert(notMoved.length == 2, "fixture needs >=2 untouched buckets")
      notMoved.foreach(n => rm(s"$b/cur/$n"))
      assert(rows(b) != expected, "fixture degenerate: deletion changed nothing")
      StreamingOps.mergeCountState(b, Seq("k"), d2, 2L)
      assert(rows(b) == expected, "mid-move completion diverged from the clean run")
      assert(!new java.io.File(s"$b/old").exists(), "old/ must be cleaned up")

      // cut C: a stale partial next from a crash before any rename —
      // it must be discarded, never published
      val c = s"$work/c"
      copyDir(s"$s1/cur", s"$c/cur")
      new java.io.File(s"$c/next").mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$c/next/garbage.parquet"), "not parquet")
      StreamingOps.mergeCountState(c, Seq("k"), d2, 2L)
      assert(rows(c) == expected)
      assert(!new java.io.File(s"$c/next").exists())
    } finally StreamingOps.BucketStateMinBytes = gateBefore
  }
}
