package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf.{ColfMaintenance, ColfVersions}

/** Sharded manifests: above an entry threshold a version file references
  * immutable entry SEGMENTS plus a tombstone list instead of inlining
  * the whole table — so a commit writes O(what changed), not O(table).
  * At 10⁵ files an append stops rewriting tens of MB of manifest per
  * commit; this spec shrinks the thresholds to pin the mechanics:
  *
  *  1. appends REUSE prior segments by name (commit cost ∝ delta);
  *  2. removals tombstone (`dead`) without touching retained segments,
  *     and a mostly-dead segment is REWRITTEN, bounding tombstone debt;
  *  3. every snapshot stays time-travel-exact across the format
  *     transition in both directions (inline↔sharded);
  *  4. vacuum sweeps segments no retained version references — and
  *     never one a retained version needs.
  */
class ColfShardedManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_shard_test").toString

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def segFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir, "_graft_versions")
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName).filter(n => n.startsWith("seg-") && n.endsWith(".json")).toSet
  }

  private def versionJson(dir: String, v: Long): String =
    scala.io.Source.fromFile(
      new java.io.File(dir, f"_graft_versions/v$v%012d.json")).mkString

  private def withKnobs[A](inlineMax: Int, segMax: Int)(body: => A): A = {
    val (oi, os) = (ColfVersions.InlineMaxEntries, ColfVersions.SegmentMaxEntries)
    ColfVersions.InlineMaxEntries = inlineMax
    ColfVersions.SegmentMaxEntries = segMax
    try body finally {
      ColfVersions.InlineMaxEntries = oi
      ColfVersions.SegmentMaxEntries = os
    }
  }

  test("appends reuse segments: commit writes O(delta), not O(table)") {
    withKnobs(0, 4) {
      val dir = tmp()
      spark.range(0, 80).select($"id".cast("int").as("k"), ($"id" * 1.0).as("v"))
        .repartition(8)
        .write.format("colf").option("manifest", "true").mode("append").save(dir)
      val segsV1 = segFiles(dir)
      assert(segsV1.size >= 2, s"expected multi-segment manifest, got $segsV1")
      assert(versionJson(dir, 1L).contains("\"segs\":["))

      spark.range(80, 90).select($"id".cast("int").as("k"), ($"id" * 1.0).as("v"))
        .coalesce(1)
        .write.format("colf").mode("append").save(dir)
      val root = new org.apache.hadoop.fs.Path(dir)
      val v2 = versionJson(dir, 2L)
      // every v1 segment is referenced BY NAME in v2 — only the new
      // file's segment was written
      assert(segsV1.forall(v2.contains), s"v2 dropped a reusable segment: $v2")
      assert((segFiles(dir) -- segsV1).size == 1,
        "one append should add exactly one new segment")
      // and the data is exact, both live and time-traveled
      assert(spark.read.format("colf").load(dir).count() == 90)
      assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 80)
      assert(ColfVersions.read(fs(dir), root, 2L).size == 9)
    }
  }

  test("removals tombstone; a mostly-dead segment is rewritten") {
    withKnobs(0, 100) {
      val dir = tmp()
      // one segment holding 10 single-file entries
      spark.range(0, 100).select($"id".cast("int").as("k"), ($"id" % 10).cast("int").as("p"),
          ($"id" * 1.0).as("v"))
        .write.format("colf").option("partitionBy", "p").option("manifest", "true")
        .mode("append").save(dir)
      val segsV1 = segFiles(dir)
      spark.conf.set("spark.sql.catalog.colf_shard",
        classOf[graft.sources.colf.ColfCatalog].getName)

      // drop ONE partition: below the rewrite ratio → segment kept,
      // tombstone recorded
      spark.sql(s"DELETE FROM colf_shard.`$dir` WHERE p = 3")
      val v2 = versionJson(dir, 2L)
      assert(segsV1.forall(v2.contains), "small delete must not rewrite the segment")
      assert(v2.contains("\"dead\":[\"p=3/"), v2)
      assert(spark.read.format("colf").load(dir).count() == 90)

      // drop most partitions: past the ratio → rewrite, tombstones gone
      spark.sql(s"DELETE FROM colf_shard.`$dir` WHERE p <= 7")
      val v3 = versionJson(dir, 3L)
      assert(!segsV1.exists(v3.contains), "mostly-dead segment must be rewritten")
      assert(v3.contains("\"dead\":[]"), v3)
      assert(spark.read.format("colf").load(dir)
        .select("p").distinct().collect().map(_.getInt(0)).toSet == Set(8, 9))
      // all three snapshots remain exact
      assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 100)
      assert(spark.read.format("colf").option("versionAsOf", 2).load(dir).count() == 90)
    }
  }

  test("inline histories cross into sharded and back without losing a snapshot") {
    withKnobs(6, 3) {
      val dir = tmp()
      def add(n: Int): Unit =
        spark.range(0, n).select($"id".cast("int").as("k"), lit(1.0).as("v"))
          .coalesce(1).write.format("colf")
          .option("manifest", "true").mode("append").save(dir)
      // v1..v4: 1 file each → inline (≤6 entries); v5..v8 cross to sharded
      (1 to 8).foreach(_ => add(5))
      val root = new org.apache.hadoop.fs.Path(dir)
      (1L to 8L).foreach { v =>
        assert(ColfVersions.read(fs(dir), root, v).size == v.toInt,
          s"version $v lost entries across the format transition")
        assert(spark.read.format("colf").option("versionAsOf", v).load(dir).count() == 5L * v)
      }
      assert(versionJson(dir, 2L).contains("\"files\":["))
      assert(versionJson(dir, 8L).contains("\"segs\":["))
    }
  }

  test("rewrite_manifests folds tombstone debt without touching data") {
    withKnobs(0, 100) {
      val dir = tmp()
      spark.range(0, 100).select($"id".cast("int").as("k"), ($"id" % 10).cast("int").as("p"),
          ($"id" * 1.0).as("v"))
        .write.format("colf").option("partitionBy", "p").option("manifest", "true")
        .mode("append").save(dir)
      spark.conf.set("spark.sql.catalog.colf_rw",
        classOf[graft.sources.colf.ColfCatalog].getName)
      // two small deletes: below the per-segment rewrite ratio, so the
      // tombstone list GROWS — exactly the debt this verb clears
      spark.sql(s"DELETE FROM colf_rw.`$dir` WHERE p = 1")
      spark.sql(s"DELETE FROM colf_rw.`$dir` WHERE p = 2")
      def dataFiles(): Map[String, Long] = {
        def walk(d: java.io.File): Seq[java.io.File] = {
          val es = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          es.filter(f => f.isFile && f.getName.endsWith(".colf")) ++
            es.filter(f => f.isDirectory && f.getName.contains('=')).flatMap(walk)
        }
        walk(new java.io.File(dir)).map(f => f.getAbsolutePath -> f.lastModified()).toMap
      }
      val segsBefore = segFiles(dir)
      assert(versionJson(dir, 3L).contains("\"dead\":[\""))
      val dataBefore = dataFiles()

      val v = spark.sql(s"CALL colf_rw.rewrite_manifests('$dir')")
        .collect()(0).getLong(0)
      assert(v == 4L)
      val v4 = versionJson(dir, 4L)
      assert(v4.contains("\"dead\":[]"), v4)
      assert(!segsBefore.exists(v4.contains), "rewrite must reference only fresh segments")
      // content identical, no data file touched (same paths, same mtimes),
      // history intact
      assert(dataFiles() == dataBefore)
      assert(spark.read.format("colf").load(dir).count() == 80)
      assert(spark.read.format("colf").option("versionAsOf", 3).load(dir).count() == 80)
      assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 100)
    }
  }

  test("same-path replacement in a kept segment rewrites it, never tombstones") {
    // A dead member whose relPath is STILL PRESENT in the new version —
    // the same-name overwrite a streaming epoch replay produces — cannot
    // be tombstoned (the path-keyed tombstone would mask the new entry
    // too). The segment must be rewritten; before this rule the
    // reconstruction check crashed the commit.
    withKnobs(0, 100) {
      val dir = tmp()
      spark.range(0, 100).select($"id".cast("int").as("k"), ($"id" * 1.0).as("v"))
        .repartition(10)
        .write.format("colf").option("manifest", "true").mode("append").save(dir)
      val root = new org.apache.hadoop.fs.Path(dir)
      val f = fs(dir)
      val es = ColfVersions.read(f, root, 1L)
      assert(es.size == 10)
      val v2 = ColfVersions.append(f, root, basis => {
        val cur = basis.get._2
        cur.head.copy(mtime = cur.head.mtime + 1000) +: cur.tail
      })
      val got = ColfVersions.read(f, root, v2)
      assert(got.size == 10)
      assert(got.find(_.relPath == es.head.relPath).get.mtime == es.head.mtime + 1000)
      assert(versionJson(dir, v2).contains("\"dead\":[]"),
        "replacement must rewrite the segment, not tombstone a live path")
      assert(spark.read.format("colf").load(dir).count() == 100)
    }
  }

  test("vacuum sweeps unreferenced segments, keeps referenced ones") {
    withKnobs(0, 3) {
      val dir = tmp()
      spark.range(0, 60).select($"id".cast("int").as("k"), ($"id" * 1.0).as("v"))
        .repartition(6)
        .write.format("colf").option("manifest", "true").mode("append").save(dir)
      // full overwrite → v2 shares nothing with v1
      spark.range(0, 30).select($"id".cast("int").as("k"), ($"id" * 2.0).as("v"))
        .repartition(3)
        .write.format("colf").mode("overwrite").save(dir)
      val before = segFiles(dir)
      ColfMaintenance.vacuumVersions(spark, dir, retainLast = 1, graceMs = 0L)
      val after = segFiles(dir)
      assert(after.nonEmpty && after.subsetOf(before))
      val v2 = versionJson(dir, 2L)
      assert(after.forall(v2.contains), "vacuum kept an unreferenced segment")
      assert((before -- after).nonEmpty, "vacuum should sweep v1's segments")
      // the retained version still reads perfectly
      assert(spark.read.format("colf").load(dir).count() == 30)
      intercept[Exception] {
        spark.read.format("colf").option("versionAsOf", 1).load(dir).collect()
      }
    }
  }
}
