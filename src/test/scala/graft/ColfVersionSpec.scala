package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf.{ColfMaintenance, ColfVersions}

/** Manifest-based snapshot versioning (ColfVersions): opt-in per table,
  * every commit appends an immutable version, reads plan from ONE
  * version's file list, old versions stay readable (`versionAsOf`)
  * until vacuumed, and overwrite/delete/compaction become manifest
  * flips instead of physical deletes — the isolation layer that keeps a
  * 1000-executor reader's file set stable under concurrent commits.
  */
class ColfVersionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_ver_test").toString

  private def colfFiles(dir: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] = {
      val es = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      es.filter(f => f.isFile && f.getName.endsWith(".colf") && !f.getName.startsWith(".")) ++
        es.filter(f => f.isDirectory && f.getName.contains('=')).flatMap(walk)
    }
    walk(new java.io.File(dir))
  }

  private def versions(dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    ColfVersions.listVersions(root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  test("overwrite under versioning: old version stays readable, files retained") {
    val dir = tmp()
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    assert(versions(dir) == Seq(1L))
    val filesV1 = colfFiles(dir).map(_.getName).toSet

    Seq((10, "x"), (20, "y"), (30, "z")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("overwrite").save(dir) // no option: auto-maintained
    assert(versions(dir) == Seq(1L, 2L))
    // physical retention: v1's files still on disk alongside v2's
    assert(filesV1.subsetOf(colfFiles(dir).map(_.getName).toSet))

    // latest read = v2; pinned read = v1
    assert(spark.read.format("colf").load(dir).select("k").as[Int].collect().sorted
      === Array(10, 20, 30))
    assert(spark.read.format("colf").option("versionAsOf", 1).load(dir)
      .select("k").as[Int].collect().sorted === Array(1, 2))
    // appends accumulate
    Seq((40, "w")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("append").save(dir)
    assert(versions(dir) == Seq(1L, 2L, 3L))
    assert(spark.read.format("colf").load(dir).count() == 4)
    assert(spark.read.format("colf").option("versionAsOf", 2).load(dir).count() == 3)
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF through the colf catalog") {
    spark.conf.set("spark.sql.catalog.colf_sql",
      classOf[graft.sources.colf.ColfCatalog].getName)
    val dir = tmp()
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    Seq((10, "x"), (20, "y"), (30, "z")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("overwrite").save(dir)

    // plain catalog read = latest snapshot
    assert(spark.sql(s"SELECT count(*) FROM colf_sql.`$dir`").as[Long].head() == 3L)
    // VERSION AS OF n == option("versionAsOf", n)
    val sqlV1 = spark.sql(s"SELECT k FROM colf_sql.`$dir` VERSION AS OF 1")
      .as[Int].collect().sorted
    val optV1 = spark.read.format("colf").option("versionAsOf", 1).load(dir)
      .select("k").as[Int].collect().sorted
    assert(sqlV1 === optV1 && sqlV1 === Array(1, 2))
    // TIMESTAMP AS OF resolves to the newest commit at-or-before t: a
    // timestamp far in the future pins the latest version
    assert(spark.sql(
      s"SELECT count(*) FROM colf_sql.`$dir` TIMESTAMP AS OF '2099-01-01'")
      .as[Long].head() == 3L)
    // ...and versionAt maps manifest mtimes monotonically
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v1Mtime = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      dir, "_graft_versions/v000000000001.json")).getModificationTime
    assert(graft.sources.colf.ColfVersions.versionAt(
      fs, new org.apache.hadoop.fs.Path(dir), v1Mtime) == 1L)
    // before the first commit: loud failure, naming the first version
    val early = intercept[Exception] {
      graft.sources.colf.ColfVersions.versionAt(
        fs, new org.apache.hadoop.fs.Path(dir), v1Mtime - 100000L)
    }
    assert(early.getMessage.contains("no version"))

    // missing snapshot and non-path identifiers fail loudly
    val gone = intercept[Exception] {
      spark.sql(s"SELECT * FROM colf_sql.`$dir` VERSION AS OF 99").collect()
    }
    assert(gone.getMessage.contains("does not exist"))
    val notPath = intercept[Exception] {
      spark.sql("SELECT * FROM colf_sql.not_a_path").collect()
    }
    assert(notPath.getMessage.contains("by path"))
    // DDL through the catalog WORKS since round 7 (ColfDdlSpec covers it);
    // DROP TABLE here doubles as the spec's cleanup
    spark.sql(s"DROP TABLE colf_sql.`$dir`")
    assert(!new java.io.File(dir).exists())
  }

  test("unversioned tables are untouched: no manifest appears, overwrite deletes") {
    val dir = tmp()
    Seq((1, "a")).toDF("k", "v").write.format("colf").mode("append").save(dir)
    val old = colfFiles(dir).map(_.getName).toSet
    Seq((2, "b")).toDF("k", "v").write.format("colf").mode("overwrite").save(dir)
    assert(versions(dir).isEmpty)
    assert(!new java.io.File(dir, ColfVersions.VersionsDir).exists())
    assert(colfFiles(dir).map(_.getName).toSet.intersect(old).isEmpty)
  }

  test("dynamic partition overwrite flips only touched partitions in the manifest") {
    val dir = tmp()
    Seq((1, "p1"), (2, "p2")).toDF("k", "p")
      .repartition(col("p")).write.format("colf")
      .option("partitionBy", "p").option("manifest", "true").mode("append").save(dir)
    val table = s"colf_ver_dyn_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $table USING colf OPTIONS (path '$dir', partitionBy 'p')")
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.get(mode)
    spark.conf.set(mode, "dynamic")
    try spark.sql(s"INSERT OVERWRITE $table VALUES (99, 'p2')")
    finally { spark.conf.set(mode, old); spark.sql(s"DROP TABLE $table") }
    val cur = spark.read.format("colf").load(dir)
      .select("k", "p").as[(Int, String)].collect().toSet
    assert(cur == Set((1, "p1"), (99, "p2")))
    val v1 = spark.read.format("colf").option("versionAsOf", 1).load(dir)
      .select("k", "p").as[(Int, String)].collect().toSet
    assert(v1 == Set((1, "p1"), (2, "p2")))
  }

  test("DELETE FROM on a versioned table is a manifest flip; vacuum reclaims") {
    val dir = tmp()
    Seq((1, "p1"), (2, "p2"), (3, "p2")).toDF("k", "p")
      .repartition(col("p")).write.format("colf")
      .option("partitionBy", "p").option("manifest", "true").mode("append").save(dir)
    val nFilesBefore = colfFiles(dir).length
    spark.read.format("colf").load(dir).createOrReplaceTempView("colf_ver_del")
    spark.sql("DELETE FROM colf_ver_del WHERE p = 'p2'")
    assert(versions(dir) == Seq(1L, 2L))
    // logical delete only: all bytes still present
    assert(colfFiles(dir).length == nFilesBefore)
    assert(spark.read.format("colf").load(dir).select("k").as[Int].collect().toSet == Set(1))
    assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 3)

    // vacuum to the latest version only: p2's files go, v1 becomes unreadable
    val (deleted, pruned) = ColfMaintenance.vacuumVersions(spark, dir, retainLast = 1, graceMs = 0L)
    assert(deleted > 0 && pruned == 1)
    assert(spark.read.format("colf").load(dir).select("k").as[Int].collect().toSet == Set(1))
    val e = intercept[Exception] {
      spark.read.format("colf").option("versionAsOf", 1).load(dir).collect()
    }
    assert(e.getMessage.contains("version 1"))
  }

  test("compaction publishes ONE atomic version: never a duplicate-visible state") {
    val dir = tmp()
    val df = (1 to 100).toDF("k").withColumn("v", col("k").cast("string"))
    df.repartition(10).write.format("colf").option("manifest", "true").mode("append").save(dir)
    assert(colfFiles(dir).length == 10)
    val (nBefore, nAfter) = ColfMaintenance.compact(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 10 && nAfter == 1)
    // exactly one new version beyond the initial write (no intermediate
    // old-union-new manifest), and the data is intact
    assert(versions(dir) == Seq(1L, 2L))
    assert(spark.read.format("colf").load(dir).count() == 100)
    assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 100)
    // inputs retained for v1 until vacuum
    assert(colfFiles(dir).length == 11)
    ColfMaintenance.vacuumVersions(spark, dir, retainLast = 1, graceMs = 0L)
    assert(colfFiles(dir).length == 1)
    assert(spark.read.format("colf").load(dir).count() == 100)
  }

  test("enableVersioning snapshots an existing table; readers pin mid-overwrite state") {
    val dir = tmp()
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.format("colf").mode("append").save(dir)
    assert(ColfMaintenance.enableVersioning(spark, dir) == 1L)
    // a reader resolves v1's exact file list; a subsequent overwrite
    // cannot disturb it (files retained, manifest immutable)
    val pinned = spark.read.format("colf").option("versionAsOf", 1).load(dir)
    Seq((9, "z")).toDF("k", "v").write.format("colf").mode("overwrite").save(dir)
    assert(pinned.select("k").as[Int].collect().sorted === Array(1, 2))
    assert(spark.read.format("colf").load(dir).select("k").as[Int].collect() === Array(9))
    intercept[IllegalArgumentException] {
      ColfMaintenance.enableVersioning(spark, dir)
    }
  }

  test("racing manifest appends: every committer lands a distinct contiguous version") {
    val dir = tmp()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(root)
    val n = 12
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to n).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            // the realistic committer: add my file to whatever basis I
            // OBSERVE — compute runs inside the claim loop, so a stale
            // basis can never drop a concurrent commit's files
            val v = ColfVersions.append(fs, root, basis =>
              basis.map(_._2).getOrElse(Seq.empty) :+
                ColfVersions.Entry(s"f$i.colf", i.toLong, 0L),
              maxRetries = 64)
            got.add(v)
          }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    // no committer lost: n distinct versions, contiguous from 1
    assert(got.size == n)
    assert(versions(dir) == (1L to n.toLong))
    // and no LOST UPDATE: the final manifest holds every committer's
    // file (a commit built from a stale basis would have dropped some)
    val finalEntries = ColfVersions.read(fs, root, n.toLong).map(_.relPath).toSet
    assert(finalEntries == (1 to n).map(i => s"f$i.colf").toSet)
  }

  test("cross-process claim primitive: hard-link publish is atomic on local FS") {
    // exists()+rename() is a TOCTOU on LocalFileSystem (POSIX rename
    // overwrites), so the file: claim is a hard link — kernel-atomic,
    // which makes a thread race equivalent to a process race: no JVM
    // lock participates in publish(). Exactly one of N concurrent
    // claimants must win, and the destination must carry the winner's
    // COMPLETE content (link makes content visible in one shot).
    val dir = tmp()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "_graft_versions"))
    assert(fs.getScheme == "file", "spec exercises the local-FS branch")
    val dst = new org.apache.hadoop.fs.Path(dir, "_graft_versions/v000000000001.json")
    val n = 16
    val ready = new java.util.concurrent.CountDownLatch(n)
    val go = new java.util.concurrent.CountDownLatch(1)
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        val t = new org.apache.hadoop.fs.Path(dir, s"_graft_versions/.claim-$i.tmp")
        val out = fs.create(t, false)
        out.write(s"""{"writer":$i}""".getBytes("UTF-8")); out.close()
        ready.countDown(); go.await()
        if (graft.sources.colf.ColfVersions.publish(fs, t, dst)) winners.add(i)
        else fs.delete(t, false)
      })
    }
    threads.foreach(_.start()); ready.await(); go.countDown(); threads.foreach(_.join())
    assert(winners.size() == 1, s"exactly one claimant must win, got $winners")
    val in = fs.open(dst)
    val content = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(content == s"""{"writer":${winners.iterator().next()}}""",
      "destination must carry the winner's complete content")
  }

  test("streaming source over a versioned table reads the manifest view, not retained files") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    // overwrite: the three old rows stay ON DISK for v1 but leave the
    // manifest — a listing-based source would wrongly re-ingest them
    Seq((10, "x")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("overwrite").save(dir)
    assert(colfFiles(dir).length == 2) // both versions' bytes present
    val qname = s"colf_ver_stream_${System.nanoTime()}"
    val q = spark.readStream.format("colf").load(dir)
      .writeStream.format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(qname).select("k").as[Int].collect().sorted
    assert(rows === Array(10)) // v2 only — never v1's retained bytes
  }

  test("streaming read rejects snapshot pins loudly (batch-only options)") {
    // A stream follows the live manifest view; silently accepting
    // versionAsOf would stream the wrong snapshot with no error.
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    Seq((1, "a")).toDF("k", "v").write.format("colf")
      .option("manifest", "true").mode("append").save(dir)
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(Option(c.getMessage).getOrElse("")); c = c.getCause }
      sb.toString
    }
    Seq("versionAsOf" -> "1", "changesSinceVersion" -> "1").foreach { case (k, v) =>
      val q = spark.readStream.format("colf").option(k, v).load(dir)
        .writeStream.format("memory").queryName(s"pin_reject_$k")
        .trigger(Trigger.AvailableNow()).start()
      val e = intercept[Exception] { q.awaitTermination() }
      assert(rootMsg(e).contains("batch-only"), s"$k must be rejected, got: ${rootMsg(e)}")
    }
  }

  test("changesSinceVersion reads exactly the delta; empty delta is an empty scan") {
    val dir = tmp()
    Seq((1, "a"), (2, "b")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    Seq((3, "c"), (4, "d")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("append").save(dir)
    Seq((5, "e")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("append").save(dir)
    // delta since v1 = appends of v2+v3; since v2 = v3 only
    assert(spark.read.format("colf").option("changesSinceVersion", 1).load(dir)
      .select("k").as[Int].collect().sorted === Array(3, 4, 5))
    assert(spark.read.format("colf").option("changesSinceVersion", 2).load(dir)
      .select("k").as[Int].collect().sorted === Array(5))
    // delta since the latest version: empty scan, schema still inferred
    val empty = spark.read.format("colf").option("changesSinceVersion", 3).load(dir)
    assert(empty.columns.toSeq == Seq("k", "v"))
    assert(empty.count() == 0)
    // unversioned table: loud failure, and the option combo is rejected
    val plain = tmp()
    Seq((1, "a")).toDF("k", "v").write.format("colf").mode("append").save(plain)
    intercept[Exception] {
      spark.read.format("colf").option("changesSinceVersion", 1).load(plain).collect()
    }
    intercept[Exception] {
      spark.read.format("colf").option("changesSinceVersion", 1)
        .option("versionAsOf", 1).load(dir).collect()
    }
  }

  test("a versioned table emptied by DELETE stays readable as an empty scan") {
    val dir = tmp()
    Seq((1, "p1"), (2, "p2")).toDF("k", "p")
      .repartition(col("p")).write.format("colf")
      .option("partitionBy", "p").option("manifest", "true").mode("append").save(dir)
    spark.read.format("colf").load(dir).createOrReplaceTempView("colf_ver_empty")
    spark.sql("DELETE FROM colf_ver_empty WHERE p IN ('p1', 'p2')")
    // latest manifest lists nothing; schema falls back to retained files
    val df = spark.read.format("colf").load(dir)
    assert(df.columns.toSeq == Seq("k", "p"))
    assert(df.count() == 0)
    // the pre-delete snapshot still reads in full
    assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 2)
  }

  test("versionAsOf on an unversioned table fails loudly") {
    val dir = tmp()
    Seq((1, "a")).toDF("k", "v").write.format("colf").mode("append").save(dir)
    val e = intercept[Exception] {
      spark.read.format("colf").option("versionAsOf", 1).load(dir).collect()
    }
    assert(e.getMessage.contains("version"))
  }

  test("TIMESTAMP AS OF survives a table copy: commit times are embedded, not mtimes") {
    val dir = tmp()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq((1, "a")).toDF("k", "v").coalesce(1)
      .write.format("colf").option("manifest", "true").mode("append").save(dir)
    Thread.sleep(20) // commit times are millis; make v1 < v2 strictly
    Seq((2, "b")).toDF("k", "v").coalesce(1)
      .write.format("colf").mode("append").save(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val t1 = ColfVersions.commitTime(fs, root, 1L)
    val t2 = ColfVersions.commitTime(fs, root, 2L)
    assert(t1 < t2, s"distinct embedded commit times expected, got $t1 / $t2")

    // relocate: copy the whole table; every copied file's mtime becomes
    // "now + 10 days" (the restore-from-backup worst case)
    val copy = tmp() + "/restored"
    org.apache.hadoop.fs.FileUtil.copy(fs, root, fs,
      new org.apache.hadoop.fs.Path(copy), false, spark.sessionState.newHadoopConf())
    val future = System.currentTimeMillis() + 10L * 86400000
    java.nio.file.Files.walk(java.nio.file.Paths.get(copy)).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) p.toFile.setLastModified(future)
    }
    val copyRoot = new org.apache.hadoop.fs.Path(copy)
    // mtime-based resolution would say NOTHING existed at t1; the embedded
    // ts keeps the original history addressable
    assert(ColfVersions.versionAt(fs, copyRoot, t1) == 1L)
    assert(ColfVersions.versionAt(fs, copyRoot, t2) == 2L)
    assert(spark.read.format("colf")
      .option("versionAsOf", ColfVersions.versionAt(fs, copyRoot, t1)).load(copy)
      .select("k").as[Int].collect().toSeq == Seq(1))
    intercept[IllegalArgumentException] {
      ColfVersions.versionAt(fs, copyRoot, t1 - 1)
    }
  }

  test("time-based retention: vacuumVersions(olderThan) prunes by commit age, latest survives") {
    val dir = tmp()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    (1 to 3).foreach { i =>
      Seq((i, s"v$i")).toDF("k", "v").coalesce(1)
        .write.format("colf").option("manifest", "true").mode("append").save(dir)
      Thread.sleep(20)
    }
    assert(versions(dir) == Seq(1L, 2L, 3L))
    val t2 = ColfVersions.commitTime(fs, root, 2L)
    // cutoff at v2's commit time, retainLast=1: v1 (strictly older) is
    // pruned, v2 is age-protected (not < cutoff), v3 is the retained tail
    val (_, pruned1) = ColfMaintenance.vacuumVersions(spark, dir,
      retainLast = 1, graceMs = 0, olderThanMillis = t2)
    assert(pruned1 == 1 && versions(dir) == Seq(2L, 3L))
    assert(spark.read.format("colf").option("versionAsOf", 2).load(dir).count() == 2)
    // age cutoff far in the future: count-based retention alone applies
    val (_, pruned2) = ColfMaintenance.vacuumVersions(spark, dir,
      retainLast = 1, graceMs = 0, olderThanMillis = Long.MaxValue)
    assert(pruned2 == 1 && versions(dir) == Seq(3L))
    assert(spark.read.format("colf").load(dir).count() == 3)
  }

  test("vacuum_versions procedure accepts older_than_days") {
    val dir = tmp()
    (1 to 3).foreach { i =>
      Seq((i, s"v$i")).toDF("k", "v").coalesce(1)
        .write.format("colf").option("manifest", "true").mode("append").save(dir)
    }
    spark.conf.set("spark.sql.catalog.colf_ret",
      classOf[graft.sources.colf.ColfCatalog].getName)
    // every commit is seconds old: a 1-day window protects all of them,
    // so even retain_last=1 prunes nothing
    val kept = spark.sql(
      s"CALL colf_ret.vacuum_versions('$dir', retain_last => 1, " +
        "grace_minutes => 0, older_than_days => 1.0)").collect()(0)
    assert(kept.getInt(1) == 0 && versions(dir) == Seq(1L, 2L, 3L))
    // disabled window (default -1): count-based pruning as before
    val again = spark.sql(
      s"CALL colf_ret.vacuum_versions('$dir', retain_last => 1, " +
        "grace_minutes => 0)").collect()(0)
    assert(again.getInt(1) == 2 && versions(dir) == Seq(3L))
  }

  test("drop-and-recreate at the same path: version-file caches serve the NEW incarnation") {
    // VERDICT r16 #1: version files are immutable only while a table
    // lives — delete + recreate rebirths v00000001.json with new content
    // at the SAME path. Path-only caches then serve the dead table's
    // schema / commit time / commit props (the exact failure that made
    // q_stream_item_cf_colf's severance guard kill every warm bench run).
    // All four caches (meta/ts/op/cprops) must key on (path,mtime,length).
    spark.conf.set("spark.sql.catalog.colf_rec",
      classOf[graft.sources.colf.ColfCatalog].getName)
    val dir = tmp() + "/t"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    // incarnation 1: declared schema (k, v); batch id 7 rides the INSERT
    spark.sql(s"CREATE TABLE colf_rec.`$dir` (k INT, v STRING)")
    ColfVersions.stageCommitProps(fs, root, Map("graft.appliedBatch" -> "7"))
    spark.sql(s"INSERT INTO colf_rec.`$dir` VALUES (1, 'a')")
    // warm all four caches against incarnation 1's version files
    assert(ColfVersions.tableMeta(fs, root).get.fields.map(_.name) == Seq("k", "v"))
    val ts1 = ColfVersions.commitTime(fs, root, 1L)
    assert(ColfVersions.commitOp(fs, root, 1L) == "create")
    assert(ColfVersions.commitProps(fs, root, 2L).get("graft.appliedBatch").contains("7"))

    fs.delete(root, true) // drop the table outright (bench rmDir scenario)
    Thread.sleep(5)       // reborn files must differ in mtime even at equal length

    // incarnation 2: different schema, a fresh query's batch id 1
    spark.sql(s"CREATE TABLE colf_rec.`$dir` (id INT, w DOUBLE, s STRING)")
    ColfVersions.stageCommitProps(fs, root, Map("graft.appliedBatch" -> "1"))
    spark.sql(s"INSERT INTO colf_rec.`$dir` VALUES (10, 1.5, 'x')")

    assert(ColfVersions.tableMeta(fs, root).get.fields.map(_.name) == Seq("id", "w", "s"),
      "stale metaCache served the dead incarnation's declared schema")
    assert(ColfVersions.commitProps(fs, root, 2L).get("graft.appliedBatch").contains("1"),
      "stale cpropsCache served the dead incarnation's applied-batch id")
    assert(ColfVersions.commitTime(fs, root, 1L) > ts1,
      "stale tsCache served the dead incarnation's commit time")
    assert(ColfVersions.commitOp(fs, root, 1L) == "create")
    // and the data itself reads back from the new incarnation
    assert(spark.sql(s"SELECT id FROM colf_rec.`$dir`").as[Int].collect().toSeq == Seq(10))
  }
}
