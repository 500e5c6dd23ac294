package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

import graft.sources.colf.{ColfMaintenance, ColfVersions}

/** Randomized HISTORY fuzz of the versioned storage layer.
  *
  * [[ColfVersionSpec]] / [[ColfRowLevelSpec]] pin each operation's
  * semantics in isolation; this suite fuzzes their COMPOSITION: a random
  * sequence of append / MERGE / DELETE (partition- and data-predicate) /
  * dynamic partition overwrite lands on one versioned table while an
  * in-memory model tracks what every committed snapshot must contain.
  * Afterwards the ENTIRE history is re-validated:
  *
  *  1. `versionAsOf v` reproduces the model's snapshot v, for every v —
  *     no operation may corrupt an OLDER snapshot (copy-on-write +
  *     manifest isolation is the claim that makes time travel safe);
  *  2. `diffVersions(v-1, v)` equals the model diff, for every
  *     consecutive pair — the CDC story composes across mixed DML;
  *  3. the live read equals the final model state;
  *  4. across append-only suffixes, `changesSinceVersion` returns
  *     exactly the appended rows (the incremental-ingest contract).
  *
  * Keys are globally unique by construction (a fresh-key counter), so
  * set equality on (k, s, p) is exact row equality.
  */
object ColfHistoryFuzzProps extends Properties("ColfHistoryFuzz") {

  // Each case builds a table + ~8 commits + O(versions) re-reads (~4 s);
  // 10 random histories per run, seed printed/pinnable via PropsConfig.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    PropsConfig.soundness(p, 10)

  private lazy val spark: SparkSession = {
    val s = SparkTest.session
    s.conf.set("spark.sql.catalog.colf_hf", classOf[graft.sources.colf.ColfCatalog].getName)
    GraftFunctions.register(s) // colf_snapshot / colf_diff TVFs
    s
  }

  private val payloads = Vector("a", "zz", "日本語", "", "payload-x")

  /** One step of a history. Row payloads are generated; keys are
    * assigned at execution time from a per-case counter, and MERGE
    * picks its matched keys deterministically from the model.
    */
  private sealed trait Op
  private case class Append(parts: List[Int], pay: Int) extends Op
  private case class Merge(nUpdate: Int, insParts: List[Int], pay: Int) extends Op
  private case class DeletePartition(p: Int) extends Op
  private case class DeleteUpTo(frac: Double) extends Op
  private case class DynOverwrite(parts: List[Int], pay: Int) extends Op
  private case object Compact extends Op

  private val genAppend: Gen[Op] = for {
    ps <- Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.take(6))
    i <- Gen.choose(0, payloads.size - 1)
  } yield Append(ps, i)

  private val genOp: Gen[Op] = Gen.frequency(
    1 -> Gen.const(Compact),
    4 -> genAppend,
    3 -> (for {
      nUp <- Gen.choose(0, 4)
      ins <- Gen.listOf(Gen.choose(0, 3)).map(_.take(3))
      i <- Gen.choose(0, payloads.size - 1)
    } yield Merge(nUp, ins, i)),
    2 -> Gen.choose(0, 3).map(DeletePartition),
    2 -> Gen.choose(0.1, 0.9).map(DeleteUpTo),
    2 -> (for {
      ps <- Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.distinct.take(2))
      i <- Gen.choose(0, payloads.size - 1)
    } yield DynOverwrite(ps, i)))

  private val genHistory: Gen[List[Op]] = for {
    // v1 must create the table: draw an Append DIRECTLY rather than
    // suchThat-filtering genOp — the filter discarded ~71% of draws
    // (P(Append)=4/14) and intermittently tripped ScalaCheck's
    // maxDiscardRatio give-up ("Gave up after only 8 passed tests");
    // the conditional distribution is identical, with zero discards.
    first <- genAppend
    rest <- Gen.listOfN(7, genOp)
  } yield first :: rest

  private def asDf(rows: Seq[(Int, String, Int)]) = {
    import spark.implicits._
    rows.toDF("k", "s", "p")
  }

  private def readVersion(dir: String, v: Option[Long]): Set[(Int, String, Int)] = {
    val base = spark.read.format("colf")
    val df = v.fold(base)(x => base.option("versionAsOf", x)).load(dir)
    df.select("k", "s", "p").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
  }

  private def latestVersion(dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    ColfVersions.listVersions(fs, root).lastOption.getOrElse(0L)
  }

  /** Manifest-format knobs per trial: the default (inline — these
    * histories stay well under 2048 files) plus shrunken thresholds that
    * force SHARDED version files with tiny segments, so segment reuse,
    * tombstoning, the rewrite-at-dead-ratio path, and inline↔sharded
    * transitions all ride every fuzzed history.
    */
  private val genKnobs: Gen[(Int, Int)] =
    Gen.oneOf((2048, 8192), (0, 2), (0, 5), (3, 3))

  /** DML-mode knob: the same histories run under copy-on-write (file
    * rewrites) and merge-on-read (deletion vectors) — MERGE and
    * data-predicate DELETE then take the delta path, so DV write/merge,
    * DV'd snapshots, diffs over DV'd versions, and compaction's DV
    * folding all ride the fuzz. Partition DELETEs stay metadata-only in
    * both modes (canDeleteWhere answers before row-level planning).
    */
  private val genDmlMode: Gen[String] =
    Gen.oneOf("copy-on-write", "merge-on-read")

  property("every snapshot, every diff, and the live view match the model") =
    forAllNoShrink(Gen.zip(genHistory, genKnobs, genDmlMode)) {
        case (ops, (inlineMax, segMax), dmlMode) =>
      val oldInline = ColfVersions.InlineMaxEntries
      val oldSeg = ColfVersions.SegmentMaxEntries
      ColfVersions.InlineMaxEntries = inlineMax
      ColfVersions.SegmentMaxEntries = segMax
      spark.conf.set("spark.colf.dml.mode", dmlMode)
      try {
      val dir = Files.createTempDirectory("colf_hist_fuzz").toString
      val view = s"hf_src_${System.nanoTime()}"
      var model = Map.empty[Int, (String, Int)] // k -> (s, p)
      var nextKey = 0
      def freshRows(parts: Seq[Int], pay: Int): Seq[(Int, String, Int)] =
        parts.map { p =>
          val k = nextKey; nextKey += 1
          (k, payloads((pay + k) % payloads.size), p)
        }

      // snapshot expected AFTER each committed version; appends[v] is
      // Some(rows) when version v was a pure file append
      var snaps = Map.empty[Long, Set[(Int, String, Int)]]
      var appended = Map.empty[Long, Set[(Int, String, Int)]]
      var vPrev = 0L

      ops.foreach { op =>
        var appendRows: Option[Seq[(Int, String, Int)]] = None
        op match {
          case Append(parts, pay) =>
            val rows = freshRows(parts, pay)
            asDf(rows).write.format("colf").option("partitionBy", "p")
              .option("manifest", "true").mode("append").save(dir)
            model ++= rows.map { case (k, s, p) => k -> (s, p) }
            appendRows = Some(rows)
          case Merge(nUpdate, insParts, pay) =>
            val upd = model.keys.toSeq.sorted.take(nUpdate)
              .map(k => (k, payloads((pay + 1 + k) % payloads.size), (k + 1) % 4))
            val ins = freshRows(insParts, pay)
            val rows = upd ++ ins
            if (rows.nonEmpty) {
              asDf(rows).createOrReplaceTempView(view)
              spark.sql(
                s"""MERGE INTO colf_hf.`$dir` t USING $view s ON t.k = s.k
                   |WHEN MATCHED THEN UPDATE SET *
                   |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
              model ++= rows.map { case (k, s, p) => k -> (s, p) }
            }
          case DeletePartition(p) =>
            spark.sql(s"DELETE FROM colf_hf.`$dir` WHERE p = $p")
            model = model.filter { case (_, (_, mp)) => mp != p }
          case DeleteUpTo(frac) =>
            if (model.nonEmpty) {
              val ks = model.keys.toSeq.sorted
              val cut = ks((ks.size * frac).toInt.min(ks.size - 1))
              spark.sql(s"DELETE FROM colf_hf.`$dir` WHERE k <= $cut")
              model = model.filter { case (k, _) => k > cut }
            }
          case DynOverwrite(parts, pay) =>
            val rows = freshRows(parts, pay)
            val tbl = s"hf_dyn_${System.nanoTime()}"
            spark.sql(s"CREATE TABLE $tbl USING colf OPTIONS (path '$dir', partitionBy 'p')")
            val mode = "spark.sql.sources.partitionOverwriteMode"
            val old = spark.conf.get(mode)
            spark.conf.set(mode, "dynamic")
            try {
              asDf(rows).createOrReplaceTempView(view)
              spark.sql(s"INSERT OVERWRITE $tbl SELECT k, s, p FROM $view")
            } finally { spark.conf.set(mode, old); spark.sql(s"DROP TABLE $tbl") }
            val touched = rows.map(_._3).toSet
            model = model.filter { case (_, (_, mp)) => !touched(mp) } ++
              rows.map { case (k, s, p) => k -> (s, p) }
          case Compact =>
            // content-neutral: publishes one version (or none when the
            // table is already a single file) with the model unchanged
            ColfMaintenance.compact(spark, dir)
        }
        val vCur = latestVersion(dir)
        assert(vCur - vPrev <= 1, s"op $op published ${vCur - vPrev} versions")
        if (vCur > vPrev) {
          snaps += vCur -> model.map { case (k, (s, p)) => (k, s, p) }.toSet
          appendRows.foreach(r => appended += vCur -> r.toSet)
          vPrev = vCur
        } else {
          // a no-op command (e.g. DELETE matching nothing) must not
          // change the live table either
          assert(readVersion(dir, None) == model.map { case (k, (s, p)) => (k, s, p) }.toSet,
            s"no-version op $op changed the live view")
        }
      }

      // 1. time travel reproduces every snapshot — through the reader
      //    option AND the SQL table function (alternating, so the SQL
      //    surface rides every fuzzed history too)
      val travelOk = snaps.forall { case (v, want) =>
        val got =
          if (v % 2 == 0)
            spark.sql(s"SELECT k, s, p FROM colf_snapshot('$dir', $v)")
              .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
          else readVersion(dir, Some(v))
        if (got != want) println(s"HIST MISMATCH versionAsOf $v: " +
          s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)} ops=$ops")
        got == want
      }
      // 2. consecutive row-level diffs match the model diff (Scala API
      //    and the colf_diff TVF, alternating)
      val versions = snaps.keys.toSeq.sorted
      val diffOk = versions.sliding(2).filter(_.size == 2).forall { case Seq(a, b) =>
        val df =
          if (a % 2 == 0) spark.sql(s"SELECT * FROM colf_diff('$dir', $a, $b)")
          else ColfMaintenance.diffVersions(spark, dir, a, Some(b))
        val d = df.select("k", "s", "p", "change").collect()
          .map(r => ((r.getInt(0), r.getString(1), r.getInt(2)), r.getString(3))).toSet
        val want = (snaps(b) -- snaps(a)).map(_ -> "added") ++
          (snaps(a) -- snaps(b)).map(_ -> "removed")
        if (d != want) println(s"HIST DIFF MISMATCH $a->$b: got=$d want=$want ops=$ops")
        d == want
      }
      // 3. live view == final model
      val liveOk = readVersion(dir, None) == snaps.getOrElse(vPrev, Set.empty)
      // 3b. the change feed REPLAYS the history: drain readChangeFeed
      //     from version 1 and fold every (insert|delete) in version
      //     order (deletes first within a version — an update is
      //     delete+insert of the same key in one commit); the folded
      //     state must equal the final model. This closes the loop on
      //     CDC: not just per-version diffs, but the composed feed.
      val cdfOk = vPrev >= 1 && {
        import org.apache.spark.sql.streaming.Trigger
        val sink = Files.createTempDirectory("colf_hist_cdf").toString
        val q = spark.readStream.format("colf")
          .option("readChangeFeed", "true").load(dir)
          .writeStream.format("parquet").option("path", s"$sink/out")
          .option("checkpointLocation", s"$sink/ck")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val changes = spark.read.parquet(s"$sink/out")
          .select("k", "s", "p", "_change_type", "_commit_version").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getInt(2),
            r.getString(3), r.getInt(4)))
        var folded = Map.empty[Int, (String, Int)]
        changes.groupBy(_._5).toSeq.sortBy(_._1).foreach { case (_, rows) =>
          rows.filter(_._4 == "delete").foreach(r => folded -= r._1)
          rows.filter(_._4 == "insert").foreach(r => folded += r._1 -> (r._2, r._3))
        }
        val want = snaps.getOrElse(vPrev, Set.empty)
        val got = folded.map { case (k, (s, p)) => (k, s, p) }.toSet
        if (got != want) println(s"HIST CDF-REPLAY MISMATCH: " +
          s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)} ops=$ops")
        got == want
      }
      // 4. changesSinceVersion across append-only suffixes
      val csOk = versions.forall { v =>
        val suffix = versions.filter(_ > v)
        if (suffix.isEmpty || !suffix.forall(appended.contains)) true
        else {
          val got = spark.read.format("colf").option("changesSinceVersion", v)
            .load(dir).select("k", "s", "p").collect()
            .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
          val want = suffix.flatMap(appended(_)).toSet
          if (got != want) println(s"HIST CS MISMATCH since $v: got=$got want=$want ops=$ops")
          got == want
        }
      }
      travelOk && diffOk && liveOk && cdfOk && csOk
      } finally {
        ColfVersions.InlineMaxEntries = oldInline
        ColfVersions.SegmentMaxEntries = oldSeg
        spark.conf.unset("spark.colf.dml.mode")
      }
    }
}
