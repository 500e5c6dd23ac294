package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf.{ColfMaintenance, ColfTools}

/** CLI parity spec: the reference's E1/E2 pipeline (csv → colf → csv)
  * driven through ColfTools on the reference's own sample data, compared
  * the way the reference's tests compare (value equality after CSV
  * re-parse, null ⇒ "" — tests/test_roundtrip.py).
  */
class ColfToolsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private val sample = "/root/reference/sample_small.csv"

  test("vacuum removes only stale orphaned temps, honors grace, keeps data") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_vacuum").toString
    Seq((1, 0), (2, 1)).toDF("k", "p")
      .write.format("colf").option("partitionBy", "p").mode("overwrite").save(dir)
    // orphaned temps: root-level and inside a partition dir (a kill -9
    // mid-write leaves exactly these)
    val t1 = Paths.get(dir, ".part-0-dead123-0.colf.tmp")
    val t2 = Paths.get(dir, "p=0", ".part-1-dead123-0.colf.tmp")
    Files.write(t1, Array[Byte](1, 2, 3)); Files.write(t2, Array[Byte](4))
    // a fresh temp (inside grace) must survive — it may be a live write
    val (seen1, del1) = ColfMaintenance.vacuum(spark, dir)
    assert(seen1 == 2 && del1 == 0)
    // age the temps past the grace window, vacuum again
    Seq(t1, t2).foreach(p => p.toFile.setLastModified(
      System.currentTimeMillis() - 25L * 3600 * 1000))
    val (seen2, del2) = ColfMaintenance.vacuum(spark, dir)
    assert(seen2 == 2 && del2 == 2)
    assert(!Files.exists(t1) && !Files.exists(t2))
    // data untouched
    assert(spark.read.format("colf").load(dir).count() == 2)
    // idempotent on a clean directory
    assert(ColfMaintenance.vacuum(spark, dir) == ((0, 0)))
  }

  test("csv_to_custom then custom_to_csv roundtrips the reference sample") {
    assume(Files.exists(Paths.get(sample)))
    val colfDir = Files.createTempDirectory("tools_colf").toString
    val outCsv = Files.createTempDirectory("tools_out").toString + "/out.csv"
    ColfTools.run(spark, Array("csv_to_custom", sample, colfDir))
    ColfTools.run(spark, Array("custom_to_csv", colfDir, outCsv))

    // compare like the reference tests: re-parse both CSVs with the same
    // inference and compare values (row order preserved is NOT guaranteed
    // by a distributed engine; compare as multisets)
    def parse(p: String) =
      graft.sources.colf.ColfInference.readCsv(spark, p)
    val orig = parse(sample)
    val round = parse(outCsv)
    assert(orig.schema == round.schema)
    assert(orig.count() == round.count())
    assert(orig.exceptAll(round).isEmpty && round.exceptAll(orig).isEmpty)
  }

  test("stats subcommand prints per-file header bounds without reading data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_stats").toString
    Seq((1, "a"), (9, "z")).toDF("k", "s").coalesce(1)
      .write.format("colf").mode("overwrite").save(dir)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      ColfTools.run(spark, Array("stats", dir))
    }
    val s = out.toString("UTF-8")
    assert(s.contains("rows=2") && s.contains("k int32") && s.contains("min=1") &&
      s.contains("max=9") && s.contains("total: 1 files, 2 rows"), s"unexpected output:\n$s")
  }

  test("compact merges a small-file directory without changing its contents") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_compact").toString
    // 12 tiny part files — the shape a long-running streaming sink leaves
    for (i <- 0 until 12)
      spark.range(i * 100L, (i + 1) * 100L).select($"id".cast("int").as("k"),
        concat(lit("v"), $"id").as("s"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".colf") && !f.getName.startsWith("."))
    assert(nFiles == 12)

    ColfTools.run(spark, Array("compact", dir, "64"))
    assert(nFiles == 1, s"expected 1 compacted file, got $nFiles")
    val back = spark.read.format("colf").load(dir)
    assert(back.count() == 1200)
    assert(back.agg(sum($"k")).head.getLong(0) == (0L until 1200L).sum)
    assert(back.where($"k" === 777).select($"s").as[String].head() == "v777")
    // no temps, no stale files
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".colf.tmp")))
  }

  test("compact with sortBy re-clusters the layout so pruning starts biting") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_compact_sort").toString
    // 8 files, each spanning the WHOLE key range (round-robin residues) —
    // stats pruning is useless on this layout
    for (i <- 0 until 8)
      spark.range(0, 500).select(($"id" * 8 + i).cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
    def planned(q: org.apache.spark.sql.DataFrame): Long =
      q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.scan.reportDriverMetrics().collectFirst {
        case m if m.name == "colfFilesPlanned" => m.value
      }.get
    val before = spark.read.format("colf").load(dir).where($"k" < 500)
    assert(planned(before) == 8L, "unsorted layout must not prune")

    // re-cluster (tiny byte target so the toy table still yields several
    // range-disjoint files)
    ColfMaintenance.compact(spark, dir, targetBytes = 4096, sortBy = Seq("k"))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".colf") && !f.getName.startsWith("."))
    assert(files.length >= 2, s"expected multiple sorted files, got ${files.length}")
    val after = spark.read.format("colf").load(dir).where($"k" < 500)
    assert(planned(after) < files.length, "sorted layout must prune")
    assert(after.count() == 500)
    assert(spark.read.format("colf").load(dir).count() == 4000)
    assert(spark.read.format("colf").load(dir).agg(sum($"k")).head.getLong(0) ==
      (0L until 4000L).sum)

    // CLI arg shape: a further sorted compaction through run() keeps data
    ColfTools.run(spark, Array("compact", dir, "64", "k"))
    assert(spark.read.format("colf").load(dir).count() == 4000)
  }

  test("merge restates ONLY the touched partitions; untouched files never move") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_merge").toString
    val upd = Files.createTempDirectory("tools_merge_upd").toString + "/u.parquet"
    Seq((1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b"), (4, 40.0, "b"))
      .toDF("k", "v", "p")
      .write.format("colf").option("partitionBy", "p").mode("overwrite").save(dir)
    def filesOf(part: String): Map[String, Long] = {
      val d = new java.io.File(dir, s"p=$part")
      d.listFiles().filter(f => f.getName.endsWith(".colf"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val bBefore = filesOf("b")
    // updates touch partition a only: replace k=1, insert k=9
    Seq((1, 11.0, "a"), (9, 99.0, "a")).toDF("k", "v", "p")
      .write.mode("overwrite").parquet(upd)
    val (ins, repl) = ColfTools.merge(spark, dir, upd, Seq("k"), "parquet")
    assert((ins, repl) == (1L, 1L))
    val got = spark.read.format("colf").load(dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set((1, 11.0, "a"), (2, 20.0, "a"), (9, 99.0, "a"),
      (3, 30.0, "b"), (4, 40.0, "b")))
    // the restatement wrote partition a only — b's files are bytewise
    // untouched (same names, same mtimes)
    assert(filesOf("b") == bBefore, "untouched partition must not be rewritten")
  }

  test("merge with a partition-moved key falls back to full restatement — no duplicate rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_merge_moved").toString
    val upd = Files.createTempDirectory("tools_merge_moved_upd").toString + "/u.parquet"
    Seq((1, 10.0, "a"), (2, 20.0, "a"), (3, 30.0, "b"), (4, 40.0, "b"))
      .toDF("k", "v", "p")
      .write.format("colf").option("partitionBy", "p").mode("overwrite").save(dir)
    // k=3 MOVES from p=b to p=a: partition-scoped overwrite of touched
    // partitions alone would leave the old (3, 30.0, b) row alive
    Seq((3, 33.0, "a")).toDF("k", "v", "p").write.mode("overwrite").parquet(upd)
    val (ins, repl) = ColfTools.merge(spark, dir, upd, Seq("k"), "parquet")
    assert((ins, repl) == (0L, 1L))
    val got = spark.read.format("colf").load(dir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set((1, 10.0, "a"), (2, 20.0, "a"), (3, 33.0, "a"), (4, 40.0, "b")),
      "moved key must not survive in its old partition")
    // the fallback preserved the hive layout (k=3 now lives under p=a)
    assert(new java.io.File(dir, "p=a").exists() && new java.io.File(dir, "p=b").exists())
    assert(spark.read.format("colf").load(dir).where($"p" === "b").count() == 1)
  }

  test("merge on an unpartitioned table restates in place (self-read overwrite)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tools_merge_flat").toString
    val upd = Files.createTempDirectory("tools_merge_flat_upd").toString + "/u.parquet"
    (1 to 100).map(i => (i, i.toDouble)).toDF("k", "v")
      .write.format("colf").mode("overwrite").save(dir)
    Seq((7, -7.0), (101, 101.0)).toDF("k", "v").write.mode("overwrite").parquet(upd)
    val (ins, repl) = ColfTools.merge(spark, dir, upd, Seq("k"), "parquet")
    assert((ins, repl) == (1L, 1L))
    val back = spark.read.format("colf").load(dir)
    assert(back.count() == 101)
    assert(back.where($"k" === 7).select("v").as[Double].head() == -7.0)
    assert(back.where($"k" === 101).count() == 1)
    // unknown update column and empty keys fail loudly
    intercept[IllegalArgumentException] { ColfTools.merge(spark, dir, upd, Seq.empty, "parquet") }
  }

  test("custom_to_csv emits a header-only file for a zero-row table") {
    import spark.implicits._
    val colfDir = Files.createTempDirectory("tools_empty").toString
    Seq((1, "x")).toDF("k", "v").limit(0)
      .write.format("colf").mode("overwrite").save(colfDir)
    val outCsv = Files.createTempDirectory("tools_empty_out").toString + "/empty.csv"
    ColfTools.run(spark, Array("custom_to_csv", colfDir, outCsv))
    val lines = Files.readAllLines(Paths.get(outCsv))
    assert(lines.size == 1 && lines.get(0) == "k,v")
  }

  test("read_columns errors on an unknown column like the reference KeyError") {
    import spark.implicits._
    val colfDir = Files.createTempDirectory("tools_cols").toString
    Seq((1, "x")).toDF("k", "v").write.format("colf").mode("overwrite").save(colfDir)
    val e = intercept[Exception] {
      ColfTools.run(spark, Array("read_columns", colfDir, "k,nope"))
    }
    assert(Option(e.getMessage).exists(m => m.contains("nope")))
  }
}
