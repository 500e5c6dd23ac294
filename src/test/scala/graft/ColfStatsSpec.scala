package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf._

/** Writer-side min/max/null-count stats and the file skipping they enable
  * (VERDICT r2 #1): stats ride as extra keys in the header schema JSON
  * (invisible to the reference reader), and ColfScan prunes whole files
  * whose bounds exclude the pushed filters.
  */
class ColfStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_stats_test").toString

  // ------------------------------------------------------------- builders

  test("int builder tracks min/max over non-null values") {
    val b = new ColfCodec.IntColumnBuilder
    b.append(5); b.appendNull(); b.append(-3); b.append(9)
    assert(b.statsMinMax == (Some(-3), Some(9)))
    assert(b.nullCnt == 1L)
  }

  test("double builder drops bounds on NaN/Inf, normalizes -0.0") {
    val ok = new ColfCodec.DoubleColumnBuilder
    ok.append(1.5); ok.append(-0.0); ok.append(2.5)
    assert(ok.statsMinMax == (Some(0.0), Some(2.5))) // -0.0 → 0.0 for bounds
    val nan = new ColfCodec.DoubleColumnBuilder
    nan.append(1.0); nan.append(Double.NaN)
    assert(nan.statsMinMax == (None, None))
    val inf = new ColfCodec.DoubleColumnBuilder
    inf.append(1.0); inf.append(Double.PositiveInfinity)
    assert(inf.statsMinMax == (None, None))
  }

  test("string builder: binary-order bounds; long min truncates, long max drops") {
    val b = new ColfCodec.StringColumnBuilder
    b.append("mango"); b.append("apple"); b.append("zebra")
    assert(b.statsMinMax == (Some("apple"), Some("zebra")))

    val long = new ColfCodec.StringColumnBuilder
    val bigMin = "a" * 100
    val bigMax = "z" * 100
    long.append(bigMin); long.append(bigMax)
    val (mn, mx) = long.statsMinMax
    assert(mn.contains("a" * 64)) // truncated prefix is a valid lower bound
    assert(mx.isEmpty)            // truncated prefix would be an INVALID upper bound

    // truncation never splits a multi-byte char (stats must survive JSON)
    val uni = new ColfCodec.StringColumnBuilder
    uni.append("é" * 40) // 2 bytes each → 80 bytes; cut must land on a boundary
    val (umn, _) = uni.statsMinMax
    val umnS = umn.get.asInstanceOf[String]
    assert(umnS == "é" * 32 && umnS.getBytes("UTF-8").length == 64)
  }

  test("non-UTF8 string bytes drop bounds instead of storing lossy ones") {
    // invalid UTF-8 (a lone 0xF5) decodes to U+FFFD, whose bytes differ —
    // a stored bound would compare in the wrong direction and could prune
    // a file that DOES contain the matching row
    val b = new ColfCodec.StringColumnBuilder
    b.append(Array(0xf5.toByte)) // 0xF5 > 'z' in unsigned byte order → the MAX
    b.append("zebra")
    val (mn, mx) = b.statsMinMax
    assert(mn.contains("zebra")) // the valid bound survives
    assert(mx.isEmpty)           // the invalid bound is dropped, not substituted
    val allBad = new ColfCodec.StringColumnBuilder
    allBad.append(Array(0x80.toByte)) // lone continuation byte: both bounds invalid
    assert(allBad.statsMinMax == (None, None))
  }

  test("all-null and empty columns carry no bounds") {
    val b = new ColfCodec.IntColumnBuilder
    b.appendNull(); b.appendNull()
    assert(b.statsMinMax == (None, None) && b.nullCnt == 2L)
    assert(new ColfCodec.DoubleColumnBuilder().statsMinMax == (None, None))
  }

  // ----------------------------------------------------- schema JSON ride

  test("stats round-trip the header JSON; reference-shaped JSON (no stats) parses") {
    val schema = ColfSchema(3L,
      IndexedSeq(ColfField("i", ColfType.Int32, true),
        ColfField("d", ColfType.Float64, false),
        ColfField("s", ColfType.Utf8, false)),
      Map(
        "i" -> ColfColStats(1L, Some(-5), Some(7)),
        "d" -> ColfColStats(0L, Some(0.25), Some(1.0E10)),
        "s" -> ColfColStats(0L, Some("a\"b"), None)))
    val back = ColfSchema.fromJson(schema.toJson)
    assert(back == schema)
    // stats keys are EXTRA — a reference-written header (none) still parses
    val ref = """{"num_rows": 2, "columns": [{"name": "x", "type": "int32", "nullable": false}]}"""
    assert(ColfSchema.fromJson(ref).stats.isEmpty)
  }

  // ------------------------------------------------------------ ColfPrune

  private def mkHeader(numRows: Long, stats: Map[String, ColfColStats],
      tpe: ColfType = ColfType.Int32, hasNulls: Boolean = false,
      compSize: Long = 100L): ColfHeader = {
    val fields = stats.keys.toIndexedSeq.sorted.map(n => ColfField(n, tpe, true))
    ColfHeader(1, true, ColfSchema(numRows, fields, stats),
      fields.map(_ => ColfColumnMeta(0L, compSize, 200L, hasNulls)), 0L)
  }

  test("prune decisions: ranges, equality, In, null checks") {
    val h = mkHeader(100L, Map("k" -> ColfColStats(0L, Some(10), Some(20))))
    def may(f: Filter): Boolean = ColfPrune.mayMatch(h, Seq(f))
    assert(!may(EqualTo("k", 5)) && may(EqualTo("k", 10)) && may(EqualTo("k", 15)) && !may(EqualTo("k", 25)))
    assert(!may(GreaterThan("k", 20)) && may(GreaterThanOrEqual("k", 20)) && may(GreaterThan("k", 19)))
    assert(!may(LessThan("k", 10)) && may(LessThanOrEqual("k", 10)))
    assert(!may(In("k", Array(1, 2, 30))) && may(In("k", Array(1, 12))))
    assert(!may(IsNull("k")) && may(IsNotNull("k")))
    assert(!may(And(GreaterThan("k", 15), LessThan("k", 14))) || !may(GreaterThan("k", 25)))
    assert(may(Or(EqualTo("k", 5), EqualTo("k", 15))) && !may(Or(EqualTo("k", 5), EqualTo("k", 25))))
    // unknown column / unknown filter shape / missing stats → keep
    assert(may(EqualTo("nope", 1)))
    val noStats = mkHeader(100L, Map("k" -> ColfColStats(0L, None, None)))
    assert(ColfPrune.mayMatch(noStats, Seq(EqualTo("k", 999))))
    // zero-row file → nothing matches
    assert(!ColfPrune.mayMatch(mkHeader(0L, Map("k" -> ColfColStats(0L, None, None))), Seq(IsNotNull("k"))))
  }

  test("prune decisions: all-null columns and string prefixes") {
    val allNull = mkHeader(10L, Map("k" -> ColfColStats(10L, None, None)))
    assert(!ColfPrune.mayMatch(allNull, Seq(EqualTo("k", 3))))
    assert(!ColfPrune.mayMatch(allNull, Seq(IsNotNull("k"))))
    assert(ColfPrune.mayMatch(allNull, Seq(IsNull("k"))))
    // reference-style all-null encoding (comp_size == 0, no stats)
    val refNull = mkHeader(10L, Map("k" -> ColfColStats(10L, None, None)), compSize = 0L)
    assert(!ColfPrune.mayMatch(refNull, Seq(IsNotNull("k"))))

    val s = mkHeader(10L,
      Map("s" -> ColfColStats(0L, Some("mango"), Some("peach"))), tpe = ColfType.Utf8)
    def may(f: Filter): Boolean = ColfPrune.mayMatch(s, Seq(f))
    assert(may(StringStartsWith("s", "ma")) && may(StringStartsWith("s", "pe")))
    assert(!may(StringStartsWith("s", "a")) && !may(StringStartsWith("s", "z")))
    assert(!may(EqualTo("s", "zzz")) && may(EqualTo("s", "nectarine")))
    assert(!may(GreaterThanOrEqual("s", "pear")) && may(LessThan("s", "mangz")))
  }

  test("truncated string min stays a safe lower bound") {
    // true min "bbbb...b" (100 bytes) stored truncated to 64 b's
    val st = ColfColStats(0L, Some("b" * 64), None)
    val h = mkHeader(10L, Map("s" -> st), tpe = ColfType.Utf8)
    // v = "a..." < truncated min ⇒ provably < true min ⇒ prune
    assert(!ColfPrune.mayMatch(h, Seq(EqualTo("s", "a"))))
    // v between truncated min and true min must be KEPT (can't disprove)
    assert(ColfPrune.mayMatch(h, Seq(EqualTo("s", "b" * 70))))
  }

  // ----------------------------------------------- end-to-end file pruning

  test("filtered scan prunes files by range stats and stays correct") {
    val dir = tmp()
    // four part files with EXACT disjoint k-ranges (append-mode writes —
    // deterministic, unlike sampled repartitionByRange boundaries)
    for (i <- 0 until 4)
      spark.range(i * 1000L, (i + 1) * 1000L)
        .select($"id".cast("int").as("k"), ($"id" % 7).cast("double").as("v"),
          concat(lit("row"), $"id").as("s"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".colf")) == 4)

    val q = spark.read.format("colf").load(dir).where($"k" < 900)
    // Catalyst pushed the filters into our ScanBuilder...
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("PushedFilters"), s"no pushed filters in: $desc")
    assert(desc.contains("files after pruning: 1/4"), s"unexpected pruning in: $desc")
    // ...the planned partitions cover exactly the 1 surviving file...
    val planned = scans.head.inputPartitions.collect {
      case p: ColfInputPartition => p.files.size
    }.sum
    assert(planned == 1, s"expected 1 planned file, got $planned")
    // ...and the SQL-UI driver metrics surface the same pruning ratio
    val metrics = scans.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(metrics == Map("colfFilesListed" -> 4L, "colfFilesPlanned" -> 1L))
    assert(scans.head.scan.supportedCustomMetrics().map(_.name).toSet ==
      Set("colfFilesListed", "colfFilesPlanned"))
    // ...and results are identical to the unpruned computation.
    assert(q.count() == 900)
    assert(q.agg(sum($"k")).as[Long].head() == (0L until 900).sum)

    // a filter matching nothing prunes everything and returns empty
    val none = spark.read.format("colf").load(dir).where($"k" > 100000)
    assert(none.count() == 0)

    // string pruning: row0..row999 vs row3000+ live in different files
    val sq = spark.read.format("colf").load(dir).where($"s" === "row3500")
    val sscans = sq.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val splanned = sscans.head.inputPartitions.collect {
      case p: ColfInputPartition => p.files.size
    }.sum
    assert(splanned < 4, s"string equality should prune some of 4 files, planned $splanned")
    assert(sq.select($"k").as[Int].collect().toSeq == Seq(3500))
  }

  // ------------------------------------------------------ equality blooms

  test("bloom: contains every inserted value, JSON round-trips, cap drops it") {
    val b = new ColfCodec.StringColumnBuilder
    val vals = (0 until 5000).map(i => s"doc-$i-${i * 2654435761L}%07x") :+ "" :+ "héllo→世界"
    vals.foreach(b.append)
    val bf = b.statsBloom.get
    def contains(bf: ColfBloom, s: String): Boolean = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bf.mightContain(ColfBloom.hash(bytes, 0, bytes.length))
    }
    assert(vals.forall(contains(bf, _)), "bloom must never miss an inserted value")
    // a bloom this size rejects almost all absent probes
    val misses = (0 until 1000).count(i => !contains(bf, s"absent-$i"))
    assert(misses > 950, s"expected <5% false positives, got ${1000 - misses}")

    // survives the header JSON round trip bit-for-bit
    val (mn, mx) = b.statsMinMax
    val schema = ColfSchema(vals.length.toLong,
      scala.collection.immutable.ArraySeq(ColfField("s", ColfType.Utf8, false)),
      Map("s" -> ColfColStats(0L, mn, mx, Some(bf))))
    val back = ColfSchema.fromJson(schema.toJson).stats("s").bloom.get
    assert(back.k == bf.k && java.util.Arrays.equals(back.bits, bf.bits))

    // past the distinct cap the bloom is dropped, not degraded
    val big = new ColfCodec.StringColumnBuilder
    (0 to ColfBloom.MaxDistinct).foreach(i => big.append(s"v$i"))
    assert(big.statsBloom.isEmpty)
    // all-null / empty columns carry none either
    val empty = new ColfCodec.StringColumnBuilder
    empty.appendNull()
    assert(empty.statsBloom.isEmpty)
  }

  test("bloom prunes string-equality probes where min/max keeps every file") {
    val dir = tmp()
    // Each file holds ids from a distinct residue class mod 4, so every
    // file spans ~the ENTIRE lexicographic range — min/max alone can
    // never exclude an equality probe.
    for (i <- 0 until 4)
      spark.range(0, 2000)
        .select(concat(lit("id-"), lpad(($"id" * 4 + i).cast("string"), 6, "0")).as("doc_id"),
          ($"id" + i).cast("int").as("n"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".colf")) == 4)

    // "id-000005" = 4*1+1 → lives only in file 1; min/max keeps all 4
    val q = spark.read.format("colf").load(dir).where($"doc_id" === "id-000005")
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val metrics = scans.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(metrics("colfFilesListed") == 4L)
    assert(metrics("colfFilesPlanned") <= 2L,
      s"bloom should prune most files on an equality probe, got $metrics")
    assert(q.select($"n").as[Int].collect().toSeq == Seq(2)) // id 5 = 4*1+1, n=1+1

    // IN list: probes from two residue classes keep ≤ 2 files (+FP slack)
    val qin = spark.read.format("colf").load(dir)
      .where($"doc_id".isin("id-000004", "id-000006"))
    val sin = qin.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val min2 = sin.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(min2("colfFilesPlanned") <= 3L, s"IN probe should prune, got $min2")
    assert(qin.count() == 2)

    // absent value: bloom prunes everything, result still correct (empty)
    assert(spark.read.format("colf").load(dir).where($"doc_id" === "id-999999x").count() == 0)
  }

  test("bloom prunes int and double equality probes where min/max keeps every file") {
    val dir = tmp()
    // Each file holds one residue class mod 8 (ids i, 8+i, 16+i, …), so
    // every file spans ~the ENTIRE numeric range — min/max alone can
    // never exclude an `id = k` point lookup on this unsorted key.
    for (i <- 0 until 4)
      spark.range(0, 2000)
        .select(($"id" * 8 + i).cast("int").as("id"),
          (($"id" * 8 + i) * 0.5).as("score"))
        .coalesce(1).write.format("colf")
        .mode(if (i == 0) "overwrite" else "append").save(dir)

    def planned(q: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val scans = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val m = scans.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
      (m("colfFilesListed"), m("colfFilesPlanned"))
    }

    // int probe: 9 ≡ 1 (mod 8) lives only in file 1; min/max keeps all 4
    val qi = spark.read.format("colf").load(dir).where($"id" === 9)
    assert(qi.select($"score").as[Double].collect().toSeq == Seq(4.5))
    val (listedI, plannedI) = planned(qi)
    assert(listedI == 4L)
    assert(plannedI <= 2L, s"int bloom should prune most of 4 files, planned $plannedI")

    // double probe: score 4.5 ⇔ id 9 — same single file
    val qd = spark.read.format("colf").load(dir).where($"score" === 4.5)
    assert(qd.select($"id").as[Int].collect().toSeq == Seq(9))
    assert(planned(qd)._2 <= 2L, "double bloom should prune")

    // absent-but-in-range value (residue 4 was never written): no rows,
    // and the plan touches (almost) nothing
    val qa = spark.read.format("colf").load(dir).where($"id" === 12)
    assert(qa.count() == 0)
    assert(planned(qa)._2 <= 1L, "absent int should bloom-prune everything")

    // zero unification: a file storing -0.0 must NOT be pruned by = 0.0
    // (and vice versa) — both sides hash the normalized bit pattern
    val zd = tmp()
    Seq((1, -0.0), (2, 5.5)).toDF("k", "score").coalesce(1)
      .write.format("colf").mode("overwrite").save(zd)
    assert(spark.read.format("colf").load(zd).where($"score" === 0.0)
      .select($"k").as[Int].collect().toSeq == Seq(1))
    // NaN: Spark's `=` matches NaN to NaN; canonical-bits hashing keeps it
    val nd = tmp()
    Seq((1, Double.NaN), (2, 1.0)).toDF("k", "score").coalesce(1)
      .write.format("colf").mode("overwrite").save(nd)
    assert(spark.read.format("colf").load(nd).where($"score" === Double.NaN)
      .select($"k").as[Int].collect().toSeq == Seq(1))
  }

  test("runtime filtering: a join's build side prunes colf FILES at execution") {
    val dir = tmp()
    // fact table range-clustered on k -> 4 files with disjoint k ranges
    spark.range(0, 4000)
      .select($"id".cast("int").as("k"), ($"id" % 7).cast("double").as("v"))
      .write.format("colf").option("sortBy", "k").option("numFiles", 4)
      .mode("overwrite").save(dir)
    // dim table: after its own filter, only keys 100..199 survive — all in
    // the fact's first file
    val dim = spark.range(0, 4000)
      .select($"id".cast("int").as("dk"), ($"id" % 40).cast("int").as("cat"))
    val fact = spark.read.format("colf").load(dir)
    val joined = fact.join(broadcast(dim.where($"cat" === 5 && $"dk" < 200)),
      $"k" === $"dk")
    val n = joined.count()
    // cat==5 ⇔ dk%40==5 → dk in {5,45,85,125,165} ∩ [0,200) = 5 rows
    assert(n == 5, s"got $n")
    // the join plan is AQE-wrapped; descend into the finalized plan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val e = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case o => o
      }
      e +: e.children.flatMap(all)
    }
    val scans = all(joined.queryExecution.executedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    // the scan carries a runtime filter and planned fewer files than listed
    assert(scans.exists(_.toString.contains("RuntimeFilters: [")),
      s"no runtime filter on the colf scan:\n${joined.queryExecution.executedPlan}")
    val metrics = scans.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(metrics("colfFilesListed") == 4L)
    assert(metrics("colfFilesPlanned") <= 1L,
      s"runtime IN filter should prune to the one matching file, got $metrics")
  }

  test("sortBy write option clusters files so pruning bites on a naturally-written table") {
    val dir = tmp()
    // SHUFFLED input — without write-side clustering every part file would
    // span the whole key range and min/max stats could never prune.
    spark.range(0, 4000)
      .select((($"id" * 2654435761L) % 4000).cast("int").as("k"),
        ($"id" % 13).cast("double").as("v"))
      .write.format("colf").option("sortBy", "k").option("numFiles", 4)
      .mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".colf")) == 4)

    // the 4 files carry near-disjoint k ranges → a narrow filter keeps 1
    val q = spark.read.format("colf").load(dir).where($"k" >= 100 && $"k" < 600)
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val metrics = scans.head.scan.reportDriverMetrics().map(m => m.name -> m.value).toMap
    assert(metrics("colfFilesListed") == 4L)
    assert(metrics("colfFilesPlanned") <= 1L,
      s"sorted write should prune 3 of 4 files, got $metrics")
    // correctness unchanged by pruning: k values are a permutation of 0..3999
    assert(q.count() == 500)

    // sortBy alone (no numFiles): AQE sizes the exchange; write must
    // succeed and round-trip (single small file is fine at this scale)
    val dir2 = tmp()
    spark.range(0, 1000).select($"id".cast("int").as("k"))
      .write.format("colf").option("sortBy", "k").mode("overwrite").save(dir2)
    assert(spark.read.format("colf").load(dir2).count() == 1000)

    // option validation fails at planning, loudly
    val bad = intercept[Exception] {
      spark.range(0, 10).select($"id".cast("int").as("k"))
        .write.format("colf").option("sortBy", "nope").mode("overwrite").save(tmp())
    }
    assert(bad.getMessage.contains("sortBy"))
    val bad2 = intercept[Exception] {
      spark.range(0, 10).select($"id".cast("int").as("k"))
        .write.format("colf").option("numFiles", 4).mode("overwrite").save(tmp())
    }
    assert(bad2.getMessage.contains("numFiles"))
  }

  test("pruning composes with limit pushdown and count stays exact") {
    val dir = tmp()
    for (i <- 0 until 4)
      spark.range(i * 250L, (i + 1) * 250L).select($"id".cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
    val q = spark.read.format("colf").load(dir).where($"k" >= 750)
    assert(q.count() == 250)
    assert(q.limit(5).collect().length == 5)
  }

  // ------------------------------------------------------- header caching

  test("headers are fetched once per file, in parallel, and cached across queries") {
    val dir = tmp()
    spark.range(600).select($"id".cast("int").as("k"))
      .repartition(6).write.format("colf").mode("overwrite").save(dir)
    val n = new java.io.File(dir).listFiles().count(_.getName.endsWith(".colf"))
    assert(n >= 2)

    val before = ColfHeaderCache.fetches.get()
    // count(*) pushdown answers from headers: exactly one fetch per file
    assert(spark.read.format("colf").load(dir).count() == 600)
    val afterFirst = ColfHeaderCache.fetches.get()
    assert(afterFirst - before == n, s"expected $n header fetches, got ${afterFirst - before}")

    // the same files again — filters, counts, stats — cost ZERO new fetches
    assert(spark.read.format("colf").load(dir).count() == 600)
    assert(spark.read.format("colf").load(dir).where($"k" < 100).count() == 100)
    assert(ColfHeaderCache.fetches.get() == afterFirst)
  }

  test("header cache LRU: cold churn past the cap keeps the hot working set, fetches bounded") {
    // Build one hot 2-file directory and 8 cold single-file directories.
    def mkDir(rows: Int, parts: Int): String = {
      val d = tmp()
      spark.range(rows).select($"id".cast("int").as("k"))
        .repartition(parts).write.format("colf").mode("overwrite").save(d)
      d
    }
    val hot = mkDir(100, 2)
    val colds = Seq.fill(8)(mkDir(10, 1))
    val conf = new org.apache.hadoop.conf.Configuration()
    def refs(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".colf") && !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => ColfFileRef(f.getAbsolutePath, f.length(), f.lastModified())).toSeq
    val hotRefs = refs(hot)
    assert(hotRefs.size == 2)

    val saved = ColfHeaderCache.maxEntries
    try {
      ColfHeaderCache.maxEntries = 4
      val base = ColfHeaderCache.fetches.get()
      ColfHeaderCache.getAll(hotRefs, conf) // hot set in cache: 2 fetches
      // interleave cold churn (10 distinct files > cap) with hot re-reads;
      // the old wholesale clear() wiped the hot set every time the cap
      // tripped — LRU keeps refreshing it, so hot re-reads stay free
      colds.foreach { c =>
        ColfHeaderCache.getAll(refs(c), conf)
        ColfHeaderCache.getAll(hotRefs, conf)
      }
      val spent = ColfHeaderCache.fetches.get() - base
      // 2 hot + 8 cold misses; every hot re-read (16 lookups) must hit
      assert(spent == 10L, s"expected 10 fetches (2 hot + 8 cold, hot re-reads free), got $spent")
    } finally ColfHeaderCache.maxEntries = saved
  }

  test("streaming sink: one commit per microbatch epoch, epoch-scoped file names") {
    val inDir = tmp()
    val outDir = tmp()
    val ckpt = tmp()
    // two input files + maxFilesPerTrigger=1 → two microbatch epochs
    Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1).write.mode("append").parquet(inDir)
    Seq((3, "c"), (4, "d")).toDF("k", "s").coalesce(1).write.mode("append").parquet(inDir)

    import org.apache.spark.sql.streaming.Trigger
    val stream = spark.readStream.schema("k INT, s STRING")
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = stream.writeStream.format("colf")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start(outDir)
    q.awaitTermination()

    val back = spark.read.format("colf").load(outDir)
    assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    val names = new java.io.File(outDir).listFiles().map(_.getName)
      .filter(_.endsWith(".colf")).sorted.toSeq
    assert(names.size == 2, s"expected one part per epoch, got $names")
    assert(names.exists(_.startsWith("part-e0-")) && names.exists(_.startsWith("part-e1-")),
      s"epoch ids missing from $names")
    assert(!new java.io.File(outDir).listFiles().exists(_.getName.endsWith(".colf.tmp")))
  }

  test("streaming source: files arriving across batches are each read exactly once") {
    val dir = tmp()
    val ckpt = tmp()
    // seed file so schema inference works at stream start
    spark.range(0, 10).select($"id".cast("int").as("k"))
      .coalesce(1).write.format("colf").mode("append").save(dir)

    val qname = s"colf_src_${System.nanoTime()}"
    val q = spark.readStream.format("colf").load(dir)
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qname).count() == 10)
      // two more files arriving later → picked up by subsequent batches
      spark.range(10, 25).select($"id".cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
      q.processAllAvailable()
      spark.range(25, 30).select($"id".cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table(qname).collect().map(_.getInt(0)).sorted.toSeq
      assert(got == (0 until 30), s"expected 0..29 exactly once, got $got")
    } finally q.stop()

    // offsets round-trip their JSON (what the checkpoint replays through)
    import graft.sources.colf.ColfSourceOffset
    val o = ColfSourceOffset(1723450000123L, Seq(s"$dir/part-a.colf", s"$dir/part-b.colf"))
    assert(ColfSourceOffset.fromJson(o.json()) == o)
  }

  test("streaming source admission control: maxFilesPerTrigger bounds each batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    for (i <- 0 until 4)
      spark.range(i * 10L, (i + 1) * 10L).select($"id".cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)

    val qname = s"colf_admit_${System.nanoTime()}"
    val q = spark.readStream.format("colf")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // all rows exactly once, but spread over ≥4 bounded batches
    val got = spark.table(qname).collect().map(_.getInt(0)).sorted.toSeq
    assert(got == (0 until 40))
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"expected ≥4 capped batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 10),
      s"a batch exceeded one file: ${batches.map(_.numInputRows).mkString(",")}")
  }

  test("streaming source admission control: maxRowsPerTrigger admits whole files by header counts") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    for (i <- 0 until 4)
      spark.range(i * 10L, (i + 1) * 10L).select($"id".cast("int").as("k"))
        .coalesce(1).write.format("colf").mode("append").save(dir)

    val qname = s"colf_rows_${System.nanoTime()}"
    val q = spark.readStream.format("colf")
      .option("maxRowsPerTrigger", "25").load(dir)
      .writeStream.format("memory").queryName(qname)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table(qname).collect().map(_.getInt(0)).sorted.toSeq == (0 until 40))
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 2, s"expected ≥2 row-capped batches, got ${batches.length}")
    // whole-file admission: while under 25 rows, files keep admitting →
    // each batch carries at most 3 files (30 rows)
    assert(batches.forall(_.numInputRows <= 30),
      s"a batch exceeded the row cap: ${batches.map(_.numInputRows).mkString(",")}")
  }

  test("streaming colf→colf pipeline is exactly-once across a checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmp()
    val dst = tmp()
    val ckpt = tmp()
    def runOnce(): Unit = {
      val q = spark.readStream.format("colf").load(src)
        .writeStream.format("colf").option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    spark.range(0, 50).select($"id".cast("int").as("k"))
      .coalesce(1).write.format("colf").mode("append").save(src)
    runOnce()
    assert(spark.read.format("colf").load(dst).count() == 50)

    // new data arrives while the query is DOWN; the restart must pick up
    // exactly the unread file — no reprocessing of the first one
    spark.range(50, 80).select($"id".cast("int").as("k"))
      .coalesce(1).write.format("colf").mode("append").save(src)
    runOnce()
    val got = spark.read.format("colf").load(dst).collect().map(_.getInt(0)).sorted.toSeq
    assert(got == (0 until 80), s"expected 0..79 exactly once, got ${got.size} rows")
  }

  test("reference reader.py still reads stats-bearing files") {
    // The stats live inside the schema JSON as extra keys; prove the
    // reference reader's json.loads + .get() path is untouched by reading
    // a stats-bearing file back through the actual reference script.
    assume(Files.exists(java.nio.file.Paths.get("/root/reference/reader.py")))
    val dir = tmp()
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")
      .coalesce(1).write.format("colf").mode("overwrite").save(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".colf") && !f.getName.startsWith(".")).head
    // header must actually carry stats
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(part))
    val header = try ColfCodec.readHeader(in) finally in.close()
    val ks = header.schema.stats("k")
    assert((ks.nullCount, ks.min, ks.max) == ((0L, Some(1), Some(3))))
    assert(ks.bloom.nonEmpty, "int column should carry an equality bloom too")
    val s = header.schema.stats("s")
    assert((s.nullCount, s.min, s.max) == ((0L, Some("a"), Some("c"))))
    assert(s.bloom.nonEmpty, "string column should carry an equality bloom")
    val outCsv = Files.createTempFile("colf_stats_compat", ".csv").toString
    val py = new ProcessBuilder("python3", "/root/reference/reader.py",
      "custom_to_csv", part.getAbsolutePath, outCsv).redirectErrorStream(true).start()
    val out = new String(py.getInputStream.readAllBytes(), "UTF-8")
    assert(py.waitFor() == 0, s"reference reader failed:\n$out")
    val lines = Files.readAllLines(java.nio.file.Paths.get(outCsv))
    assert(lines.get(0) == "k,s" && lines.size() == 4)
    assert(lines.get(1) == "1,a" && lines.get(2) == "2,b" && lines.get(3) == "3,c")
  }
}
