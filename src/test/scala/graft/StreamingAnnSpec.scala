package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.streaming.StreamingOps

/** Pins the streaming-maintained LSH ANN index (ADVICE r16: the
  * docstring referenced this spec before it existed): bit-identity of
  * the drained segments against the one-shot signing, checkpoint-resume
  * no-op, at-least-once replay convergence (a replayed batch overwrites
  * its own segment, never duplicates), and the loud checkpoint-only
  * deletion guard.
  */
class StreamingAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val Planes = 4
  private val Dim = 8
  private val Seed = 42L
  private val Tables = 1

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** 30 deterministic unit-ish vectors over 8 dims. */
  private def corpus() = (0L until 30L).map { i =>
    (i, Array.tabulate(Dim)(j => math.sin(i * 31 + j * 7).toFloat))
  }.toDF("id", "vec")

  private def drain(feedDir: String, stateDir: String): Unit = {
    val feed = spark.readStream.schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    StreamingOps.maintainLshIndex(feed, "id", "vec", stateDir,
      planes = Planes, dim = Dim, seed = Seed, tables = Tables)
      .awaitTermination()
  }

  private def seedFeed(feedDir: String): Unit = {
    val df = corpus()
    for (r <- 0 until 3)
      df.where($"id" % 3 === r).coalesce(1).write.mode("append").parquet(feedDir)
  }

  private def indexRows(stateDir: String): Set[(Long, Long, Seq[Double])] =
    spark.read.parquet(s"$stateDir/index/b*")
      .select(col("nbr_id"), col("bucket"), col("nbr_vec"))
      .as[(Long, Long, Seq[Double])].collect().toSet

  test("drained segments are bit-identical to the one-shot signing; search agrees") {
    val feedDir = tmp("ann-feed")
    val stateDir = tmp("ann-state")
    seedFeed(feedDir)
    drain(feedDir, stateDir)
    // three immutable per-batch segments landed
    val segs = new java.io.File(s"$stateDir/index").listFiles()
      .map(_.getName).filter(_.startsWith("b")).toSet
    assert(segs == Set("b0", "b1", "b2"))
    // row-for-row identical to signing the whole corpus in one shot
    val oneShot = Similarity.lshSignCorpus(corpus(), Planes, Dim, Seed, Tables)
      .select(col("nbr_id"), col("bucket"), col("nbr_vec"))
      .as[(Long, Long, Seq[Double])].collect().toSet
    assert(indexRows(stateDir) == oneShot)
    // and the search path over the maintained index returns the same
    // neighbors as the same search over the one-shot build
    val idx = StreamingOps.lshIndexFromState(spark, stateDir, Planes, Dim, Seed, Tables)
    val queries = corpus().where($"id" < 4)
    val viaState = Similarity.lshSearch(idx, queries, k = 3)
    val viaBuild = Similarity.lshSearch(Similarity.lshBuild(
      corpus(), Planes, Dim, Seed, Tables), queries, k = 3)
    assert(viaState.exceptAll(viaBuild).count() == 0
      && viaBuild.exceptAll(viaState).count() == 0)
  }

  test("restart with no new data is a no-op: checkpoint resume, segments untouched") {
    import scala.jdk.CollectionConverters._
    val feedDir = tmp("ann-feed2")
    val stateDir = tmp("ann-state2")
    seedFeed(feedDir)
    drain(feedDir, stateDir)
    def md5s(): Map[String, String] = {
      val root = java.nio.file.Paths.get(s"$stateDir/index")
      val md = java.security.MessageDigest.getInstance("MD5")
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => root.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p)).map("%02x".format(_)).mkString)
        .toMap
    }
    val before = md5s()
    drain(feedDir, stateDir) // nothing new committed
    assert(md5s() == before, "restart without new data touched the index")
  }

  test("at-least-once replay converges: a replayed batch overwrites, never duplicates") {
    val feedDir = tmp("ann-feed3")
    val stateDir = tmp("ann-state3")
    seedFeed(feedDir)
    drain(feedDir, stateDir)
    val complete = indexRows(stateDir)
    // simulate a crash AFTER batch 2's foreachBatch but BEFORE its
    // checkpoint commit: delete the commit record (offsets stay), so the
    // restarted query replays batch 2 against the already-written segment
    val commit2 = new java.io.File(s"$stateDir/_checkpoint/commits/2")
    assert(commit2.isFile, s"expected commit file at $commit2")
    assert(commit2.delete())
    // the local FS pairs every file with a .crc shadow — a stale one
    // blocks the replayed commit's rename (reads as a concurrent writer)
    new java.io.File(s"$stateDir/_checkpoint/commits/.2.crc").delete()
    drain(feedDir, stateDir)
    assert(indexRows(stateDir) == complete,
      "replayed batch duplicated or altered its segment")
  }

  test("compaction folds committed segments; search identical; crash overlap deduped") {
    val feedDir = tmp("ann-feed5")
    val stateDir = tmp("ann-state5")
    seedFeed(feedDir)
    drain(feedDir, stateDir)
    val rowsBefore = indexRows(stateDir)
    def search() = Similarity.lshSearch(
      StreamingOps.lshIndexFromState(spark, stateDir, Planes, Dim, Seed, Tables),
      corpus().where($"id" < 4), k = 3)
      .select("query_id", "nbr_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().toSet
    val searchBefore = search()

    // fold: b0+b1 (committed) merge, b2 (the replayable batch) survives
    assert(StreamingOps.compactLshIndex(spark, stateDir) == ((3, 2)))
    val names = new java.io.File(s"$stateDir/index").listFiles()
      .map(_.getName).filter(_.startsWith("b")).sorted.toSeq
    assert(names.exists(_.matches("b1_c[0-9a-f]+")) && names.contains("b2"),
      s"unexpected segment layout after compaction: $names")
    assert(indexRows(stateDir) == rowsBefore, "compaction changed index content")
    assert(search() == searchBefore, "compaction changed search results")

    // crash window: folded rows visible TWICE (delete phase interrupted)
    val compacted = names.find(_.matches("b1_c[0-9a-f]+")).get
    val src = java.nio.file.Paths.get(s"$stateDir/index/$compacted")
    val dup = java.nio.file.Paths.get(s"$stateDir/index/b0")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
      val t = dup.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    assert(search() == searchBefore,
      "duplicate segments changed search results — candidate dedupe failed")
    // the next compaction folds the overlap away at the ROW level
    assert(StreamingOps.compactLshIndex(spark, stateDir) == ((3, 2)))
    val flat = spark.read.parquet(s"$stateDir/index/b*")
    assert(flat.count() == rowsBefore.size, "row-level overlap survived re-compaction")
    assert(indexRows(stateDir) == rowsBefore && search() == searchBefore)
    // nothing foldable left: idempotent no-op
    assert(StreamingOps.compactLshIndex(spark, stateDir) == ((2, 2)))
  }

  test("checkpoint-only deletion is detected loudly, not silently re-indexed") {
    val feedDir = tmp("ann-feed4")
    val stateDir = tmp("ann-state4")
    seedFeed(feedDir)
    drain(feedDir, stateDir)
    // delete ONLY the checkpoint: the fresh query restarts batch ids at 0
    // and re-reads the whole feed — folding it into the surviving index
    // would double every vector, so the recorded query id must throw
    val ck = new scala.reflect.io.Directory(new java.io.File(s"$stateDir/_checkpoint"))
    assert(ck.deleteRecursively())
    val e = intercept[Exception] { drain(feedDir, stateDir) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("separated")),
      s"expected the state/checkpoint separation guard, got: ${messages(e)}")
  }
}
