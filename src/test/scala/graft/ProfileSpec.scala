package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** The profiler's two modes: exact (oracle-checkable baseline, EXPAND
  * plan) and approx (the 100-TB path — HLL++ sketches, no row
  * replication). The approx path must stay within its declared error
  * bound against the exact counts on a real corpus, and must actually
  * drop the EXPAND from the plan (that replication factor — one copy of
  * every row per profiled column — is exactly what a wide table at
  * corpus scale cannot afford).
  */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  test("approx mode: distinct counts within rsd bound of exact; rows/nulls exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val cols = Seq("doc_id", "source", "lang", "text")
    val exact = Profile.profile(docs, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Profile.profile(docs, cols, approxDistinct = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(exact.keySet == approx.keySet)
    cols.foreach { c =>
      val (en, enn, end) = exact(c)
      val (an, ann, and) = approx(c)
      assert((an, ann) == (en, enn), s"$c: rows/nulls must stay exact")
      // HLL++ at rsd=0.05: |err| is ~rsd; 3*rsd is a conservative pin
      // (deterministic — the sketch is a pure function of the data)
      val err = math.abs(and - end).toDouble / math.max(1L, end)
      assert(err <= 0.15, s"$c: approx distinct $and vs exact $end (err $err)")
    }
  }

  test("approx mode drops the EXPAND row-replication from the plan") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, s"s${i % 7}", i % 3)).toDF("a", "b", "c")
    val exactPlan = Profile.profile(df).queryExecution.executedPlan.toString
    val approxPlan = Profile.profile(df, approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-column distinct is the EXPAND plan (baseline shape)")
    assert(!approxPlan.contains("Expand"),
      "approx mode must aggregate sketches without row replication")
  }

  test("bad inputs fail loudly") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    intercept[IllegalArgumentException] { Profile.profile(df, Seq("nope")) }
    intercept[IllegalArgumentException] {
      Profile.profile(df, approxDistinct = true, approxRsd = 1.5)
    }
  }

  test("histogramDrift: tvd 0 on identical, 1 on disjoint, exact on a hand case") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def vals(xs: Double*) = xs.toDF("v")
    def tvd(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
            bins: Int = 4) =
      Profile.histogramDrift(a, b, col("v"), bins).select("tvd").head().getDouble(0)
    val x = vals(1.00, 2.00, 3.00, 4.00)
    assert(tvd(x, x) == 0.0)
    // fully separated ranges: every bin is one-sided
    assert(tvd(vals(1.00, 1.50), vals(100.00, 101.00)) == 1.0)
    // hand case, 2 bins over cents 100..400 (w = ceil(301/2) = 151):
    // bin0 = [100, 251): base {1.00, 2.00}, cur {1.00}; bin1: base {4.00},
    // cur {4.00}. p_base = (2/3, 1/3), p_cur = (1/2, 1/2) → tvd = 1/6.
    val t = tvd(vals(1.00, 2.00, 4.00), vals(1.00, 4.00), bins = 2)
    assert(math.abs(t - 1.0 / 6.0) < 1e-15, s"got $t")
    // per-bin counts surface correctly
    val rows = Profile.histogramDrift(vals(1.00, 2.00, 4.00), vals(1.00, 4.00),
        col("v"), 2)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 2L, 1L), (1L, 1L, 1L)))
  }

  test("joinKeySkew: exact stats, rank-selected percentiles, salt from max/p99") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one 100-row monster key + 99 singletons: p50/p99 are 1, p999 is the
    // monster, salt = ceil(100/1)
    val df = (Seq.fill(100)("hot") ++ (1 to 99).map(i => s"k$i")).toDF("k")
    val r = Profile.joinKeySkew(df, col("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 199L, 100L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((1L, 1L, 100L)))
    assert(r.getDouble(6) == 100.0 / 199.0)
    assert(r.getLong(7) == 100L)
    // benign distribution: salt collapses to 1
    val even = (1 to 50).flatMap(i => Seq.fill(4)(s"k$i")).toDF("k")
    val e = Profile.joinKeySkew(even, col("k")).head()
    assert(e.getLong(4) == 4L && e.getLong(7) == 1L)
  }

  test("winsorize clips to rank-selected group bounds; interior rows untouched") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // group g: values 1..10 → at (0.2, 0.8): lo = ceil(0.2*10)=2nd smallest
    // = 2.0, hi = ceil(0.8*10)=8th = 8.0
    val df = (1 to 10).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "v")
    val out = Profile.winsorize(df, col("id"), col("grp"), col("v"), 0.2, 0.8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1L) == ((2.0, 8.0, 2.0)))   // clipped up
    assert(out(10L) == ((2.0, 8.0, 8.0)))  // clipped down
    assert(out(5L) == ((2.0, 8.0, 5.0)))   // interior untouched
    // duplicate-heavy values: bounds respect row counts, not distinct ranks
    val dup = (Seq.fill(8)(1.0) ++ Seq(5.0, 9.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "v")
    val b = Profile.winsorize(dup, col("id"), col("grp"), col("v"), 0.0, 0.8)
      .select("lo", "hi").head()
    assert(b.getDouble(0) == 1.0 && b.getDouble(1) == 1.0) // cum(1.0)=8 >= ceil(.8*10)
  }

  test("madOutliers flags beyond k*MAD with rank-selected medians; MAD=0 flags every deviator") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // g1: 10,12,14,16,18,1000 → lower median (3rd of 6) = 14;
    // devs {4,2,0,2,4,986} → sorted {0,2,2,4,4,986}, MAD = 3rd = 2;
    // threshold 3*2 = 6 → only the 1000 row (dev 986) flags.
    // g2: over half the rows identical → MAD = 0 → every deviator flags.
    val rows = Seq(
      (1L, "g1", 10.0), (2L, "g1", 12.0), (3L, "g1", 14.0),
      (4L, "g1", 16.0), (5L, "g1", 18.0), (6L, "g1", 1000.0),
      (11L, "g2", 5.0), (12L, "g2", 5.0), (13L, "g2", 5.0),
      (14L, "g2", 5.0), (15L, "g2", 5.5)).toDF("id", "grp", "v")
    val out = Profile.madOutliers(rows, col("id"), col("grp"), col("v"), k = 3.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(6L, 15L), s"flagged ${out.keySet}")
    assert(out(6L) == ((14.0, 2.0, 986.0)))
    assert(out(15L) == ((5.0, 0.0, 0.5)))
    // partitioning invariance: medians are selections over counts, not
    // row order
    val rep = Profile.madOutliers(rows.repartition(7), col("id"), col("grp"),
      col("v"), k = 3.0).collect().map(_.getLong(0)).toSet
    assert(rep == Set(6L, 15L))
  }

  test("madOutliers: planted NULL values are excluded from medians and never flagged") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Same g1 as above PLUS three null-value rows. The documented
    // contract (Profile.scala null filter): nulls can be neither median
    // candidates nor outliers. If the isNotNull filter were removed, the
    // nulls would enter the count table, Spark's nulls-first window
    // order would shift every cumulative count, and the rank-selected
    // median would move 14 → 12 — so this fixture FAILS without the
    // filter, not just survives it.
    val rows = Seq(
      (1L, "g1", Some(10.0)), (2L, "g1", Some(12.0)), (3L, "g1", Some(14.0)),
      (4L, "g1", Some(16.0)), (5L, "g1", Some(18.0)), (6L, "g1", Some(1000.0)),
      (21L, "g1", None), (22L, "g1", None), (23L, "g1", None)
    ).toDF("id", "grp", "v")
    val out = Profile.madOutliers(rows, col("id"), col("grp"), col("v"), k = 3.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(6L), s"flagged ${out.keySet}")
    assert(out(6L) == ((14.0, 2.0, 986.0)),
      "medians must be computed over NON-NULL values only (med 14, mad 2)")
  }

  test("histogramDrift: single-point distributions collapse to one bin, tvd 0") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val one = Seq(5.00, 5.00).toDF("v")
    val out = Profile.histogramDrift(one, one, col("v"), 8).collect()
    assert(out.length == 1 && out.head.getDouble(4) == 0.0)
  }
}
