package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** END-TO-END differential fuzz of the whole colf scan stack.
  *
  * [[ColfEvalExactProps]] / [[ColfPruneProps]] prove the absorption and
  * pruning PRIMITIVES sound against hand-built `Filter` objects — but the
  * round-5 wrong-results bug lived in the composition: Catalyst's
  * predicate translation feeding `exactShape`'s gate feeding `evalExact`,
  * with the absorbed filter then REMOVED from the residual set nobody
  * re-checks. This suite fuzzes that composition at the real boundary:
  * random predicate trees (null-element IN lists, NaN / -0.0 literals,
  * prefix probes, Not/Or nesting, partition + data columns mixed) are run
  * through an actual partitioned colf table — pushdown, absorption,
  * min/max + Bloom skipping, partition pruning, vectorized decode,
  * residual evaluation all live — and the result must be row-identical
  * to Spark filtering the same rows in memory. Any unsoundness anywhere
  * in the stack shows up as a diff; no mocking, no layer boundaries.
  *
  * The table is written once (32 files across 8 hive partitions, two
  * appends so per-partition files carry disjoint `i` ranges for stats to
  * bite on); each case costs two small scans.
  */
object ColfScanFuzzProps extends Properties("ColfScanFuzz") {

  // Fewer iterations than the unit props (each case is a full write-less
  // scan, ~100 ms): 120 trees × ~4 leaves each still sweeps thousands of
  // leaf shapes per run, seed printed/pinnable via PropsConfig.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    PropsConfig.soundness(p, 120)

  private lazy val spark: SparkSession = SparkTest.session

  private val dataSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bucket", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Deterministic edge-heavy rows: nulls in every data column, NaN /
    * -0.0 / 1⁄3 doubles, empty + unicode strings, int extremes.
    */
  private def mkRows(from: Int, until: Int): Seq[Row] = {
    val rnd = new scala.util.Random(42 + from)
    val strs = Array("a", "b", "zz", "id-0001", "日本語", "", "xyz")
    (from until until).map { k =>
      val i: Integer =
        if (rnd.nextInt(8) == 0) null
        else if (rnd.nextInt(20) == 0) (if (rnd.nextBoolean()) Int.MaxValue else Int.MinValue)
        else Int.box(k % 17 - 3)
      val d: java.lang.Double =
        if (rnd.nextInt(8) == 0) null
        else rnd.nextInt(10) match {
          case 0 => Double.NaN
          case 1 => -0.0
          case 2 => 0.0
          case 3 => 1.0 / 3.0
          case _ => Double.box((k % 13) * 0.25 - 1.5)
        }
      val s: String = if (rnd.nextInt(8) == 0) null else strs(rnd.nextInt(strs.length))
      // partition VALUES stay plain ASCII: non-ASCII directory names fail
      // on a POSIX-locale JVM (java.io mangles them; vanilla Spark parquet
      // throws TASK_WRITE_FAILED on the identical write here), and the
      // writer itself rejects '='/'/'/leading-dot values loudly — unicode
      // lives in the data columns, where it's file content, not file names
      Row(i, d, s, k % 4, if (k % 3 == 0) "alpha" else if (k % 3 == 1) "beta" else "gamma")
    }
  }

  /** (colf-backed view, in-memory oracle of the same rows). The table is
    * VERSIONED: manifest-recorded stats then drive the zero-I/O pruning
    * tier, so every random predicate tree sweeps the recorded path —
    * synthetic-header construction, the stats JSON round trip (double
    * formatting, string escaping, the all-null convention) included.
    * The header tier stays covered by `ColfPruneProps` and every
    * unversioned spec.
    */
  private lazy val (colfDf, refDf): (DataFrame, DataFrame) = {
    val dir = Files.createTempDirectory("colf_fuzz").toString
    val all = mkRows(0, 300) ++ mkRows(300, 600)
    // two appends with disjoint k-ranges → per-partition files whose `i`
    // min/max differ, so stats pruning participates, not just partitions
    Seq(mkRows(0, 300), mkRows(300, 600)).foreach { half =>
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(half.asJava, dataSchema)
        .repartition(2)
        .write.format("colf").option("partitionBy", "bucket,tag")
        .option("manifest", "true")
        .mode("append").save(dir)
    }
    val colf = spark.read.format("colf").load(dir)
      .select("i", "d", "s", "bucket", "tag") // fixed column order
    import scala.jdk.CollectionConverters._
    // The oracle is deliberately NOT .cache()d: Spark 4.1's in-memory
    // columnar cache prunes batches with a NaN-unsafe stat comparison, so
    // a cached `WHERE d > 1.75` DROPS NaN rows that Spark's own
    // uncached comparison (NaN sorts largest) keeps — this fuzzer found
    // that divergence on its first run, with the colf scan on the
    // CORRECT side (reproduce: Seq(NaN,1.0,2.0).toDF("d").cache()
    // .where($"d" > 1.75) → 1 row; uncached → 2).
    val ref = spark.createDataFrame(all.asJava, dataSchema)
    assert(ref.count() == 600 && colf.count() == 600)
    (colf, ref)
  }

  // ---- predicate-tree generator (Column + printable description) ----

  private val genIntLit: Gen[Any] = Gen.frequency(
    5 -> Gen.choose(-5, 15).map(Int.box),
    1 -> Gen.oneOf(Int.box(0), Int.box(Int.MaxValue), Int.box(Int.MinValue)))
  private val genDoubleLit: Gen[Any] = Gen.oneOf(
    0.0, -0.0, Double.NaN, 0.25, 1.0 / 3.0, -1.5, 1.75).map(Double.box)
  private val genStrLit: Gen[Any] =
    Gen.oneOf("a", "b", "zz", "id-0001", "日本語", "", "x", "id-")
  // actual partition values, near-misses, and prefix probes
  private val genTagLit: Gen[Any] =
    Gen.oneOf("alpha", "beta", "gamma", "alph", "alphaa", "a", "", "zz")

  private def litFor(c: String): Gen[Any] = c match {
    case "i" | "bucket" => genIntLit
    case "d"            => genDoubleLit
    case "tag"          => genTagLit
    case _              => genStrLit
  }

  private val genCol: Gen[String] = Gen.oneOf("i", "d", "s", "bucket", "tag")

  private def leaf(c: String): Gen[(Column, String)] = {
    val v = litFor(c)
    val cmps: Seq[Gen[(Column, String)]] = Seq(
      v.map(x => (col(c) === lit(x), s"$c = $x")),
      v.map(x => (col(c) <=> lit(x), s"$c <=> $x")),
      v.map(x => (col(c) > lit(x), s"$c > $x")),
      v.map(x => (col(c) >= lit(x), s"$c >= $x")),
      v.map(x => (col(c) < lit(x), s"$c < $x")),
      v.map(x => (col(c) <= lit(x), s"$c <= $x")),
      // IN lists, one in five carrying a NULL element — the round-5
      // counterexample shape (`p NOT IN (1, 2, NULL)`), now end-to-end
      Gen.listOfN(3, v).flatMap { vs =>
        Gen.frequency(4 -> Gen.const(vs), 1 -> Gen.const(vs :+ (null: Any)))
          .map(xs => (col(c).isin(xs: _*), s"$c IN (${xs.mkString(",")})"))
      },
      Gen.const((col(c).isNull, s"$c IS NULL")),
      Gen.const((col(c).isNotNull, s"$c IS NOT NULL")))
    val withPrefix =
      if (c == "s" || c == "tag")
        cmps :+ litFor(c).map(p => (col(c).startsWith(lit(p.asInstanceOf[String])), s"$c LIKE '$p%'"))
      else cmps
    Gen.oneOf(withPrefix(0), withPrefix(1), withPrefix.drop(2): _*)
  }

  private def genPred(depth: Int): Gen[(Column, String)] =
    if (depth <= 0) genCol.flatMap(leaf)
    else Gen.frequency(
      3 -> genCol.flatMap(leaf),
      1 -> Gen.lzy(for {
        (l, ls) <- genPred(depth - 1); (r, rs) <- genPred(depth - 1)
      } yield (l && r, s"($ls AND $rs)")),
      1 -> Gen.lzy(for {
        (l, ls) <- genPred(depth - 1); (r, rs) <- genPred(depth - 1)
      } yield (l || r, s"($ls OR $rs)")),
      1 -> Gen.lzy(genPred(depth - 1).map { case (c, s) => (!c, s"NOT $s") }))

  /** Canonical row text: NaN, -0.0 and null all kept distinct (set-op
    * based comparison would normalize exactly the edges under test).
    *
    * `normZero` is for AGGREGATE results only: min/max over a group
    * holding both -0.0 and 0.0 (SQL-equal) returns an UNSPECIFIED
    * representative — Spark keeps the first encountered, so two scans
    * with different row orders legitimately differ bitwise (the 4×
    * sweep caught colf and in-memory disagreeing in BOTH directions).
    * Row-level results keep the distinction: filters pass values
    * through verbatim.
    */
  private def canon(df: DataFrame, normZero: Boolean = false): Seq[String] =
    df.collect().toSeq.map { r =>
      (0 until r.length).map { k =>
        if (r.isNullAt(k)) "␀"
        else r.get(k) match {
          case d: Double =>
            java.lang.Double.toString(if (normZero && d == 0.0d) 0.0d else d)
          case x => x.toString
        }
      }.mkString("|")
    }.sorted

  /** Random projections (possibly duplicated, possibly reordered, never
    * empty) — the pruned vectorized decode path must compose with every
    * filter: the scan reads only the projected columns, while the
    * predicate may reference columns NOT in the projection.
    */
  private val genProjection: Gen[Seq[String]] = Gen.frequency(
    2 -> Gen.const(Seq("i", "d", "s", "bucket", "tag")),
    3 -> Gen.nonEmptyListOf(genCol).map(_.take(4)))

  property("colf scan == in-memory filter for random predicate trees") =
    forAllNoShrink(Gen.zip(genPred(2), genProjection)) { case ((pred, desc0), proj) =>
      val desc = s"$desc0 SELECT ${proj.mkString(",")}"
      def run(df: DataFrame) =
        canon(df.where(pred).select(proj.map(col): _*))
      val got = scala.util.Try(run(colfDf))
      val want = scala.util.Try(run(refDf))
      (got, want) match {
        case (scala.util.Success(g), scala.util.Success(w)) =>
          val ok = g == w
          if (!ok) println(s"FUZZ MISMATCH [$desc]\n  colf=${g.size} rows, ref=${w.size} rows\n" +
            s"  colf-only=${g.diff(w).take(5)}\n  ref-only=${w.diff(g).take(5)}")
          ok
        // the connector must not introduce (or swallow) analysis/runtime
        // failures the in-memory path doesn't have
        case (scala.util.Failure(_), scala.util.Failure(_)) => true
        case (g, w) =>
          println(s"FUZZ DIVERGENT OUTCOME [$desc]: colf=$g ref=$w")
          false
      }
    }

  // ---- aggregate fuzz: the metadata-only pushdown layer ----
  //
  // COUNT/MIN/MAX over (possibly filtered, possibly grouped) colf scans
  // may be answered ENTIRELY from file headers — like absorption, a
  // wrong answer there is silent (no data rows flow to re-check). Every
  // generated aggregate must match Spark aggregating the same rows in
  // memory, whether the plan went metadata-only, partially pruned, or
  // fell back to a full scan.

  private def genAgg: Gen[(String, String)] = Gen.oneOf(
    Gen.const(("*", "count")),
    genCol.map(c => (c, "count")),
    genCol.map(c => (c, "min")),
    genCol.map(c => (c, "max")))

  private val genAggCase: Gen[(Seq[String], List[(String, String)], Option[(Column, String)])] =
    for {
      g <- Gen.oneOf(Seq.empty[String], Seq("bucket"), Seq("tag"), Seq("bucket", "tag"))
      n <- Gen.choose(1, 3)
      as <- Gen.listOfN(n, genAgg)
      p <- Gen.option(genPred(1))
    } yield (g, as, p)

  property("colf aggregates == in-memory aggregates (metadata pushdown live)") =
    forAllNoShrink(genAggCase) { case (gcols, aggs, pred) =>
      def run(df: DataFrame): Seq[String] = {
        val base = pred.fold(df) { case (p, _) => df.where(p) }
        val aggCols = aggs.zipWithIndex.map {
          case (("*", "count"), i) => count(lit(1)).as(s"a$i")
          case ((c, "count"), i)   => count(col(c)).as(s"a$i")
          case ((c, "min"), i)     => min(col(c)).as(s"a$i")
          case ((c, _), i)         => max(col(c)).as(s"a$i")
        }
        val out =
          if (gcols.isEmpty) base.agg(aggCols.head, aggCols.tail: _*)
          else base.groupBy(gcols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        canon(out, normZero = true)
      }
      val desc = s"GROUP BY $gcols AGG $aggs WHERE ${pred.map(_._2)}"
      (scala.util.Try(run(colfDf)), scala.util.Try(run(refDf))) match {
        case (scala.util.Success(g), scala.util.Success(w)) =>
          val ok = g == w
          if (!ok) println(s"AGG FUZZ MISMATCH [$desc]\n  colf=$g\n  ref =$w")
          ok
        case (scala.util.Failure(_), scala.util.Failure(_)) => true
        case (g, w) =>
          println(s"AGG FUZZ DIVERGENT OUTCOME [$desc]: colf=$g ref=$w")
          false
      }
    }

  /** LIMIT pushdown plans a file-coverage subset — it must never
    * under-deliver: exactly min(n, matching-rows) rows come back, with
    * or without a filter in front.
    */
  property("LIMIT under random predicates delivers exactly min(n, matching)") =
    forAllNoShrink(Gen.zip(genPred(1), Gen.choose(0, 700))) { case ((pred, desc), n) =>
      (scala.util.Try(refDf.where(pred).count()),
        scala.util.Try(colfDf.where(pred).limit(n).count())) match {
        case (scala.util.Success(total), scala.util.Success(got)) =>
          val want = math.min(n.toLong, total)
          if (got != want) println(s"LIMIT FUZZ MISMATCH [$desc LIMIT $n]: got=$got want=$want")
          got == want
        case (scala.util.Failure(_), scala.util.Failure(_)) => true
        case (t, g) =>
          println(s"LIMIT FUZZ DIVERGENT [$desc LIMIT $n]: ref=$t colf=$g")
          false
      }
    }

  /** The production-reachable round-5 shape, pinned end-to-end: a NOT IN
    * with a NULL element over a PARTITION column must keep zero rows
    * (old absorption kept all 600 — and nothing downstream re-checked).
    */
  property("regression: NOT IN (…, NULL) over a partition column keeps nothing") = {
    import org.scalacheck.Prop
    val zero = colfDf.where(!col("bucket").isin(1, 2, null)).count() == 0L &&
      colfDf.where(!col("tag").isin("alpha", null)).count() == 0L
    // and the same shapes over DATA columns (stats-prune + residual path)
    val zeroData = colfDf.where(!col("i").isin(1, 2, null)).count() == 0L
    Prop(zero && zeroData) :| s"partitionShapes=$zero dataShapes=$zeroData"
  }
}
