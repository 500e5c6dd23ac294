package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Clustering, Retrieval, Sampling}

/** Pins the semantics of the event-analytics, retrieval, and clustering
  * operators on hand-built inputs where the expected answer is computable
  * by inspection — the value-level gate is the DuckDB oracle at sf0.01;
  * these specs pin the EDGES the oracle's data may not exercise (ordering
  * constraints, zero-variance groups, emptied clusters, fill-zeros).
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val us = 1000000L

  test("engine pin: ANSI Spark throws on DOUBLE division by exact 0.0") {
    // The motivation every NULL-on-zero divide guard in this repo cites
    // (pearson / twap / zscore / cosineFromNorms): under ANSI (the
    // Spark 4 default, and this session's mode) division by an
    // exact-0.0 divisor raises DIVIDE_BY_ZERO for DOUBLES TOO -- Spark's
    // Divide is DivModLike for every numeric type, not just
    // integral/decimal. Adjudicates ADVICE r12 #5, which claimed doubles
    // yield IEEE Inf/NaN: empirically FALSE on this engine (both the
    // constant-folded and the runtime evaluation path throw). The NULL
    // guards are therefore BOTH robustness (no mid-job crash on
    // degenerate groups) and portability (engines that do return
    // Inf/NaN disagree with each other on compare/serialize).
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean)
    val folded = intercept[Exception] {
      spark.sql("SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)").collect()
    }
    assert(folded.getMessage.toUpperCase.contains("DIVIDE_BY_ZERO"), folded.getMessage)
    // runtime path (non-literal divisor -- no constant folding possible)
    val runtime = intercept[Exception] {
      Seq((1.0, 0.0)).toDF("a", "b").select($"a" / $"b").collect()
    }
    assert(runtime.getMessage.toUpperCase.contains("DIVIDE_BY_ZERO"), runtime.getMessage)
    // the integral form throws identically
    val e = intercept[Exception] { spark.sql("SELECT 1 div 0").collect() }
    assert(e.getMessage.toUpperCase.contains("DIVIDE_BY_ZERO"), e.getMessage)
  }

  test("ohlcBars: open/close by (ts, tie) order, extremes, multiple keys") {
    // key A, bar X: (t=1,id=1,v=5) (t=1,id=2,v=9) (t=3,id=1,v=2) ->
    //   open=5 (t tie broken by id), high=9, low=2, close=2
    // key A, bar Y: single row. key B, bar X: two rows, close by later ts.
    val df = Seq(
      ("A", "X", 1L, 1L, 5.0), ("A", "X", 1L, 2L, 9.0), ("A", "X", 3L, 1L, 2.0),
      ("A", "Y", 7L, 1L, 4.0),
      ("B", "X", 2L, 9L, -1.0), ("B", "X", 5L, 1L, 8.0)
    ).toDF("k", "bar", "t", "id", "v")
    val out = Analytics.ohlcBars(df, Seq($"k"), $"bar", $"t", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out == Map(
      ("A", "X") -> ((3L, 5.0, 9.0, 2.0, 2.0)),
      ("A", "Y") -> ((1L, 4.0, 4.0, 4.0, 4.0)),
      ("B", "X") -> ((2L, -1.0, 8.0, -1.0, 8.0))))
    // partitioning invariance (no arrival-order dependence)
    val rep = Analytics.ohlcBars(df.repartition(7), Seq($"k"), $"bar", $"t", $"id", $"v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(rep == out)
  }

  test("globalShuffleOrder: exact permutation, md5-rank reference, salt reshuffles") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 400L).map(i => Tuple1(i * 7 % 1000)).toDF("id")
    val out = Sampling.globalShuffleOrder(df, $"id")
    val positions = out.select("pos").collect().map(_.getLong(0)).sorted
    assert(positions.toSeq == (0L until 400L))
    // equals the naive single-partition window form exactly
    val key = concat(md5(concat(lit("shuffle-v1"), $"id".cast("string")).cast("binary")),
      lit("|"), $"id".cast("string"))
    val ref = df.withColumn("pos_ref",
        row_number().over(Window.orderBy(key)).cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    // partitioning invariance
    val rep = Sampling.globalShuffleOrder(df.repartition(13), $"id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == got)
    // a different salt is a different epoch order (not the identity map)
    val salted = Sampling.globalShuffleOrder(df, $"id", salt = "epoch-2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted != got)
    assert(salted.values.toSeq.sorted == (0L until 400L))
  }

  // ---- funnel ---------------------------------------------------------

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("u", "et", "tus")

  test("funnel counts only in-order completions") {
    // u1 completes a->b->c in order; u2 does b BEFORE a (b must not count);
    // u3 stops after a; u4 never does a.
    val events = ev(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "b", 5L), (2L, "a", 10L), (2L, "c", 20L),
      (3L, "a", 10L),
      (4L, "b", 10L), (4L, "c", 20L))
    val out = Analytics.funnel(events, col("u"), col("et"), col("tus"),
      Seq("a", "b", "c"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // step a: u1,u2,u3. step b after a: only u1. step c after that b: u1.
    // u2's c at 20 is after their a at 10 but they never did b after a.
    assert(out.toSeq == Seq((1, "a", 3L), (2, "b", 1L), (3, "c", 1L)))
  }

  test("funnel uses strict 'after' (same timestamp does not advance)") {
    val events = ev((1L, "a", 10L), (1L, "b", 10L))
    val out = Analytics.funnel(events, col("u"), col("et"), col("tus"), Seq("a", "b"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 0L))
  }

  test("funnel horizon caps the conversion window per step") {
    // u1 converts within the horizon; u2's b lands after it
    val events = ev(
      (1L, "a", 0L), (1L, "b", 50L),
      (2L, "a", 0L), (2L, "b", 200L))
    val out = Analytics.funnel(events, col("u"), col("et"), col("tus"),
      Seq("a", "b"), horizonMicros = Some(100L))
      .orderBy("step").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(2L, 1L))
    // horizon boundary is inclusive
    val edge = Analytics.funnel(ev((3L, "a", 0L), (3L, "b", 100L)),
      col("u"), col("et"), col("tus"), Seq("a", "b"), Some(100L))
      .orderBy("step").collect().map(_.getLong(2))
    assert(edge.toSeq == Seq(1L, 1L))
  }

  // ---- retention ------------------------------------------------------

  test("retention cohorts by first epoch-week and counts distinct users") {
    val wk = 604800000000L
    val events = ev(
      (1L, "x", 0L * wk), (1L, "x", 0L * wk + 5L), (1L, "x", 2L * wk), // cohort 0, offs 0,2
      (2L, "x", 1L * wk), (2L, "x", 2L * wk),                          // cohort 1, offs 0,1
      (3L, "x", 1L * wk))                                              // cohort 1, off 0
    val out = Analytics.retention(events, col("u"), col("tus"))
      .orderBy("cohort_week", "week_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 2L), (1L, 1L, 1L)))
  }

  // ---- gap fill -------------------------------------------------------

  test("gapFillDaily emits explicit zeros over the corpus day range") {
    val day = 86400000000L
    val events = ev(
      (1L, "x", 0L * day), (1L, "x", 2L * day), (1L, "x", 2L * day + 7L),
      (2L, "x", 1L * day))
    val out = Analytics.gapFillDaily(events, col("u"), col("tus"))
    // 2 users x days 0..2 = 6 rows, zero-filled where absent
    assert(out.count() == 6)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(m((1L, 0L)) == 1L && m((1L, 1L)) == 0L && m((1L, 2L)) == 2L)
    assert(m((2L, 0L)) == 0L && m((2L, 1L)) == 1L && m((2L, 2L)) == 0L)
    // rendered date pairs with the epoch day
    val d0 = out.where(col("day") === 0L).select("day_s").head().getString(0)
    assert(d0 == "1970-01-01")
  }

  // ---- z-score outliers ----------------------------------------------

  test("zscoreOutliers flags beyond z sigma and skips zero-variance groups") {
    val rows = (1 to 99).map(i => (i.toLong, "g", 10.0)) :+ (100L, "g", 1000.0)
    val flat = (1 to 50).map(i => (1000L + i, "flat", 7.0))
    val df = (rows ++ flat).toDF("id", "grp", "v")
    val out = Analytics.zscoreOutliers(df, col("id"), col("grp"), col("v"), z = 2.0)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L))
    assert(out.head.getDouble(3) > 2.0) // the z value itself
  }

  // ---- pearson --------------------------------------------------------

  test("pearson detects perfect positive and negative correlation") {
    val rows = Seq(
      ("pos", 1.0, 2.0), ("pos", 2.0, 4.0), ("pos", 3.0, 6.0),
      ("neg", 1.0, 3.0), ("neg", 2.0, 2.0), ("neg", 3.0, 1.0),
      ("mix", 1.0, 1.0), ("mix", 2.0, 5.0), ("mix", 3.0, 2.0))
      .toDF("g", "x", "y")
    val out = Analytics.pearson(rows, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("pos") - 1.0) < 1e-12)
    assert(math.abs(out("neg") + 1.0) < 1e-12)
    assert(out("mix") > -1.0 && out("mix") < 1.0)
  }

  // ---- expectations ---------------------------------------------------

  test("expectations report counts violations per check; null predicate is not a violation") {
    val df = Seq(
      (1L, Some("abc"), 3),
      (2L, Some("xy"), 5),         // n_chars wrong
      (3L, None: Option[String], 0), // null text: not_null violated,
                                     // n_chars check NULL -> no violation
      (1L, Some("q"), 1))            // duplicate key
      .toDF("id", "text", "n_chars")
    val out = operators.Expectations.check(df,
      rowChecks = Seq(
        "not_null" -> col("text").isNotNull,
        "len_ok" -> (col("n_chars") === length(col("text")))),
      uniqueKeys = Seq("id_unique" -> Seq(col("id"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null") == ((4L, 1L, false)))
    assert(out("len_ok") == ((4L, 1L, false)))   // only row 2; row 3 is NULL
    assert(out("id_unique") == ((4L, 1L, false)))
  }

  test("expectations pass on a clean table") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val out = operators.Expectations.check(df,
      rowChecks = Seq("not_null" -> col("text").isNotNull),
      uniqueKeys = Seq("id_unique" -> Seq(col("id"))))
      .collect()
    assert(out.forall(_.getBoolean(3)))
  }

  // ---- skyline --------------------------------------------------------

  test("trendSpearman: +1 rising, -1 falling, exact value on a hand case") {
    import graft.operators.Analytics
    val day = 86400000000L
    def series(g: String, vals: Double*) =
      vals.zipWithIndex.map { case (v, i) => (g, i * day, v) }
    val events = (series("up", 1.0, 2.0, 3.0, 4.0) ++
      series("down", 9.0, 7.0, 5.0, 3.0) ++
      series("mix", 1.0, 3.0, 2.0, 4.0)).toDF("grp", "tus", "v")
    val out = Analytics.trendSpearman(events, col("grp"), col("tus"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    // ±1 up to the sqrt(a)*sqrt(a) != a ulp (the expression is shared
    // verbatim with the oracle, so cross-engine it is bit-identical; it
    // is just not exactly the real number 1)
    assert(math.abs(out("up") - 1.0) < 1e-14)
    assert(math.abs(out("down") + 1.0) < 1e-14)
    // mix ranks: rx (1,2,3,4), ry (1,3,2,4) → rho = 1 - 6*2/(4*15) = 0.8
    assert(math.abs(out("mix") - 0.8) < 1e-14)
  }

  test("kAnonymityViolations reports exactly the sub-k quasi-id combos") {
    import graft.operators.Expectations
    val df = Seq(("en", "web"), ("en", "web"), ("en", "web"),
      ("en", "book"), ("zh", "web"), ("zh", "web")).toDF("lang", "src")
    val out = Expectations.kAnonymityViolations(df, Seq(col("lang"), col("src")), 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // (en,web)=3 passes at k=3; (en,book)=1 and (zh,web)=2 violate
    assert(out == Set(("en", "book", 1L), ("zh", "web", 2L)))
    assert(Expectations.kAnonymityViolations(df, Seq(col("lang")), 2L).count() == 0)
  }

  test("lDiversityViolations: homogeneous-but-large groups flagged, diverse pass, null sensitive ignored") {
    import graft.operators.Expectations
    // (en,web): 3 rows, 1 distinct sens -> violates l=2 even though it is
    // 3-anonymous. (en,book): 2 rows, 2 distinct -> passes. (zh,web): 2
    // rows, sens (A, null) -> count(distinct)=1 (null ignored) -> violates.
    val df = Seq(("en", "web", "A"), ("en", "web", "A"), ("en", "web", "A"),
      ("en", "book", "A"), ("en", "book", "B"),
      ("zh", "web", "A"), ("zh", "web", null))
      .toDF("lang", "src", "sens")
    val out = Expectations.lDiversityViolations(df.repartition(3),
        Seq(col("lang"), col("src")), col("sens"), 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(("en", "web", 3L, 1L), ("zh", "web", 2L, 1L)))
  }

  test("holtLinear: recurrence by hand, zero-beta degenerates to ewma level, fitted lags one step") {
    // alpha=0.5, beta=0.5; x = 2, 6, 10:
    // l1=2 b1=0 | l2=.5*6+.5*2=4, b2=.5*(4-2)+.5*0=1, fit2=2
    // l3=.5*10+.5*(4+1)=7.5, b3=.5*(7.5-4)+.5*1=2.25, fit3=5
    val df = Seq(("k", 1L, 2.0), ("k", 2L, 6.0), ("k", 3L, 10.0)).toDF("g", "o", "x")
    val out = Analytics.holtLinear(df.repartition(3), col("g"), col("o"), col("x"),
        alpha = 0.5, beta = 0.5).orderBy("ord").collect()
      .map(r => (r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(out.toSeq == Seq((2.0, 0.0, None), (4.0, 1.0, Some(2.0)),
      (7.5, 2.25, Some(5.0))))
    // beta=0: trend stays 0, level follows the ewma recurrence exactly
    val h0 = Analytics.holtLinear(df, col("g"), col("o"), col("x"), 0.25, 0.0)
      .orderBy("ord").collect().map(r => (r.getDouble(3), r.getDouble(4)))
    val ew = Analytics.ewma(df, col("g"), col("o"), col("x"), 0.25)
      .orderBy("ord").collect().map(_.getDouble(3))
    assert(h0.map(_._2).forall(_ == 0.0) && h0.map(_._1).toSeq == ew.toSeq)
  }

  test("holtWinters: recurrence by hand; gamma=0 reduces exactly to holtLinear") {
    // m=2, alpha=beta=gamma=0.5; x = 4, 8, 6, 10 (ord 1..4):
    // t1: l=4 b=0 s=[0,0]                          (init; fitted null)
    // t2 slot1(0b): shat=s[2]=0
    //   l=.5*(8-0)+.5*(4+0)=6, b=.5*(6-4)+.5*0=1, s[2]=.5*(8-6)+.5*0=1, fit=4
    // t3 slot0: shat=s[1]=0
    //   l=.5*(6-0)+.5*(6+1)=6.5, b=.5*(6.5-6)+.5*1=.75,
    //   s[1]=.5*(6-6.5)+.5*0=-.25, fit=7
    // t4 slot1: shat=s[2]=1
    //   l=.5*(10-1)+.5*(6.5+.75)=8.125, b=.5*(8.125-6.5)+.5*.75=1.1875,
    //   s[2]=.5*(10-8.125)+.5*1=1.4375, fit=6.5+.75+1=8.25
    val df = Seq(("k", 1L, 4.0), ("k", 2L, 8.0), ("k", 3L, 6.0), ("k", 4L, 10.0))
      .toDF("g", "o", "x")
    val out = Analytics.holtWinters(df.repartition(3), col("g"), col("o"), col("x"),
        m = 2, alpha = 0.5, beta = 0.5, gamma = 0.5).orderBy("ord").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(out.toSeq == Seq(
      (4.0, 0.0, 0.0, None),
      (6.0, 1.0, 1.0, Some(4.0)),
      (6.5, 0.75, -0.25, Some(7.0)),
      (8.125, 1.1875, 1.4375, Some(8.25))), s"got ${out.toSeq}")
    // gamma=0: seasonals never leave zero, so level/trend/fitted equal
    // plain Holt bit for bit
    val hw0 = Analytics.holtWinters(df, col("g"), col("o"), col("x"),
        m = 3, alpha = 0.25, beta = 0.5, gamma = 0.0).orderBy("ord").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    val h = Analytics.holtLinear(df, col("g"), col("o"), col("x"),
        alpha = 0.25, beta = 0.5).orderBy("ord").collect()
      .map(r => (r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(hw0.map(t => (t._1, t._2, t._4)).toSeq == h.toSeq)
    assert(hw0.forall(_._3 == 0.0))
  }

  test("ssspBounded: hop bound vs convergence, weighted detour beats direct edge, parallel-edge min") {
    // 1-2 w=10 direct; 1-3 w=1, 3-2 w=2 -> detour costs 3 but needs 2 hops.
    // rounds=1 sees only the direct 10; rounds=2 finds 3.
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L),
      (2L, 1L, 7L)) // parallel to 1-2 reversed: min(10,7)=7 canonical
      .toDF("s", "d", "w")
    def run(r: Int): Map[Long, Long] =
      operators.Graph.ssspBounded(edges, col("s"), col("d"), col("w"),
          Seq(1L).toDF("n"), col("n"), rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(0) == Map(1L -> 0L))
    assert(run(1) == Map(1L -> 0L, 2L -> 7L, 3L -> 1L))
    assert(run(2) == Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
    assert(run(3) == run(2)) // converged
    // rounds >= 5 crosses the every-4-rounds plan-truncation checkpoint
    // (the lazy chain references dist twice per round, so the logical
    // plan doubles between seals) — result must be identical through it
    assert(run(9) == run(2))
  }

  test("rrfFuse: fixed-order score, absent side contributes zero, tie-break and topK") {
    import graft.operators.Retrieval
    val a = Seq(("d1", 1), ("d2", 2)).toDF("doc_id", "rank")
    val b = Seq(("d2", 1), ("d3", 2)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, c = 60, topK = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // d2 in both lists: 1/62 + 1/61; d1 only A: 1/61; d3 only B: 1/62
    assert(out == Map("d2" -> (1.0 / 62 + 1.0 / 61), "d1" -> 1.0 / 61))
    // topK=3 admits d3; fused ranks follow (score desc, doc_id)
    val all = Retrieval.rrfFuse(a, b, c = 60, topK = 3).collect()
      .map(r => (r.getString(0), r.getInt(4))).toSet
    assert(all.map(_._1) == Set("d1", "d2", "d3"))
  }

  test("fkOrphans counts child rows pointing at absent parents") {
    import graft.operators.Expectations
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 9L), (13L, 8L)).toDF("id", "fk")
    val out = Expectations.fkOrphans(Seq(
        ("child->parent", child, col("fk"), parent, col("pk"))))
      .head()
    assert((out.getString(0), out.getLong(1), out.getLong(2), out.getBoolean(3)) ==
      (("child->parent", 4L, 2L, false)))
    // clean relationship passes
    val clean = Expectations.fkOrphans(Seq(
        ("c", child.where(col("fk") === 1L), col("fk"), parent, col("pk")))).head()
    assert(clean.getLong(2) == 0L && clean.getBoolean(3))
  }

  test("skyline2D keeps exactly the non-dominated per-group frontier") {
    val pts = Seq(
      ("g", 1.0, 9.0), ("g", 5.0, 5.0), ("g", 9.0, 1.0), // frontier
      ("g", 4.0, 4.0),  // dominated by (5,5)
      ("g", 5.0, 3.0),  // same x as (5,5), lower y
      ("g", 1.0, 8.0),  // same x as (1,9), lower y
      ("h", 2.0, 2.0))  // other group: alone => frontier
      .toDF("g", "x", "y")
    val out = Analytics.skyline2D(pts, col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out == Set(("g", 1.0, 9.0), ("g", 5.0, 5.0), ("g", 9.0, 1.0), ("h", 2.0, 2.0)))
  }

  // ---- two-proportion z-test -----------------------------------------

  test("twoProportionZTest computes the pooled z from exact counts") {
    // A: 3/4 convert; B: 1/4 convert
    val rows = Seq(
      ("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", false), ("B", false), ("B", false)).toDF("v", "s")
    val r = Analytics.twoProportionZTest(rows, col("v"), col("s"), "A", "B").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 4L, 1L)))
    val (pa, pb, pp) = (0.75, 0.25, 0.5)
    val expected = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(r.getDouble(4) == expected)
  }

  test("twoProportionZTest nulls z on degenerate 100% conversion instead of throwing") {
    val rows = Seq(("A", true), ("A", true), ("B", true)).toDF("v", "s")
    val r = Analytics.twoProportionZTest(rows, col("v"), col("s"), "A", "B").head()
    assert(r.isNullAt(4))
  }

  test("triangleCount: known graphs, orientation-invariance, celebrity node") {
    def tc(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = operators.Graph.triangleCount(
        edges.toDF("s", "d"), col("s"), col("d")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // K4: C(4,3) = 4 triangles; C5 cycle: none; two triangles sharing an
    // edge: exactly 2 (the shared closing edge must not collapse them —
    // the regression the wedge-source carry exists for)
    assert(tc(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))) == ((4L, 6L, 4L)))
    assert(tc(Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,1L))) == ((5L, 5L, 0L)))
    assert(tc(Seq((1L,2L),(1L,3L),(2L,3L),(4L,2L),(4L,3L))) == ((4L, 5L, 2L)))
    // direction, duplicates, and self-loops collapse before counting
    assert(tc(Seq((2L,1L),(1L,2L),(3L,1L),(2L,3L),(1L,1L))) == ((3L, 3L, 1L)))
    // celebrity hub: star + one rim edge = 1 triangle, any hub degree
    val star = (2L to 40L).map(i => (1L, i)) ++ Seq((2L, 3L))
    assert(tc(star) == ((40L, 40L, 1L)))
  }

  test("kCore: cascade peeling (one pass is not the fixpoint), empty core, clique core") {
    def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
      operators.Graph.kCore(edges.toDF("s", "d"), col("s"), col("d"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle {1,2,3} + a pendant chain 3-4-5: 2-core = the triangle,
    // but peeling 5 (deg 1) drops 4 to deg 1 — a single filter pass
    // keeps 4, only the fixpoint removes it
    val chain = Seq((1L,2L),(2L,3L),(1L,3L),(3L,4L),(4L,5L))
    assert(core(chain, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k above the clique degree: empty core (and kCore terminates)
    assert(core(chain, 3) == Map.empty)
    // K5: the 4-core is the whole clique with degree 4
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(core(k5, 4) == (1L to 5L).map(_ -> 4L).toMap)
    // direction/duplicate/self-loop collapse, like triangleCount
    assert(core(Seq((2L,1L),(1L,2L),(3L,1L),(2L,3L),(1L,1L)), 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore runs ONE action per peel round (VERDICT r17 #4)") {
    // The min-degree fixpoint test must ride the job that materializes
    // the round's degree cache — a separate min-agg action per round
    // pays the scheduling floor twice at thousands of late peel rounds.
    // Jobs are counted with AQE and broadcast builds disabled (both
    // split one action into several jobs, making the count
    // nondeterministic); the budget is initial-min + one per round +
    // the final localCheckpoint.
    val sc = spark.sparkContext
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled")
    val bcPrev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.addSparkListener(listener)
    try {
      // path 1-2-3-4-5, k=2: r1 peels {1,5}, r2 {2,4}, r3 {3} -> empty.
      val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L)).toDF("s", "d")
      val got = operators.Graph.kCore(edges, col("s"), col("d"), 2).collect()
      assert(got.isEmpty)
      // listener events are posted async: poll until the count is stable
      var last = -1; var cur = counter.get(); var spins = 0
      while (cur != last && spins < 50) {
        last = cur; Thread.sleep(100); cur = counter.get(); spins += 1
      }
      val rounds = 3
      // +2 = the initial min-agg and the final localCheckpoint; the
      // collect() above adds 1. Anything beyond that is a per-round
      // extra action creeping back in.
      assert(cur <= rounds + 3, s"kCore ran $cur jobs for $rounds peel rounds")
    } finally {
      sc.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcPrev)
    }
  }

  test("triangleCount and kCore agree with brute force on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + rnd.nextInt(6)
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (i, j)).toSeq
      if (edges.nonEmpty) {
        val adj = edges.toSet
        def connected(a: Long, b: Long) = adj((a min b, a max b))
        val bruteTri = (for {
          a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
          if connected(a, b) && connected(a, c) && connected(b, c)
        } yield 1).size.toLong
        val r = operators.Graph.triangleCount(
          edges.toDF("s", "d"), col("s"), col("d")).collect()(0)
        assert(r.getLong(2) == bruteTri, s"trial $trial: triangles")
        // brute-force k-core by iterated peeling on the driver
        val k = 3
        var cur = adj
        var stable = false
        while (!stable) {
          val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (x, xs) => x -> xs.size }
          val keep = deg.filter(_._2 >= k).keySet
          val next = cur.filter(e => keep(e._1) && keep(e._2))
          stable = next == cur
          cur = next
        }
        val expDeg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
          .filter(_._2 >= k)
        val got = operators.Graph.kCore(edges.toDF("s", "d"), col("s"), col("d"), k)
          .collect().map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
        assert(got == expDeg, s"trial $trial: k-core")
      }
    }
  }

  test("clusteringCoefficient: per-node credit, degree-1 NULL, exact coeffs") {
    // two triangles sharing edge (2,3), pendant 5 hanging off 4:
    //   1: d=2 t=1 coeff=1.0; 2,3: d=3 t=2 coeff=2/3;
    //   4: d=3 t=1 coeff=1/3; 5: d=1 t=0 coeff=NULL
    val edges = Seq((1L,2L),(1L,3L),(2L,3L),(4L,2L),(4L,3L),(4L,5L)).toDF("s","d")
    val out = operators.Graph.clusteringCoefficient(edges, col("s"), col("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)))))
      .toMap
    assert(out == Map(
      1L -> ((2L, 1L, java.lang.Double.valueOf(1.0))),
      2L -> ((3L, 2L, java.lang.Double.valueOf(2.0 / 3))),
      3L -> ((3L, 2L, java.lang.Double.valueOf(2.0 / 3))),
      4L -> ((3L, 1L, java.lang.Double.valueOf(1.0 / 3))),
      5L -> ((1L, 0L, null))))
    // per-node sums are 3x the global count
    val total = operators.Graph.triangleCount(edges, col("s"), col("d"))
      .collect()(0).getLong(2)
    assert(out.values.map(_._2).sum == 3 * total)
  }

  test("bfsDistances: hop layers, unreachable absent, multi-source min, isolated source") {
    // path 1-2-3-4, triangle 10-11-12 (disconnected from the path)
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(10L,11L),(11L,12L),(10L,12L)).toDF("s","d")
    def bfs(srcs: Seq[Long]): Map[Long, Long] =
      operators.Graph.bfsDistances(edges, col("s"), col("d"),
        srcs.toDF("n"), col("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bfs(Seq(1L)) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // multi-source: every node takes the NEAREST source's distance
    assert(bfs(Seq(1L, 4L)) == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
    // source in the other component reaches only its component
    assert(bfs(Seq(10L)) == Map(10L -> 0L, 11L -> 1L, 12L -> 1L))
    // a source absent from the graph still reports itself at 0
    assert(bfs(Seq(99L)) == Map(99L -> 0L))
  }

  test("bfsDistances: high-eccentricity path crosses the settled-fold boundary") {
    // 20-hop path: the settled set folds into a localCheckpoint every 8
    // rounds (Graph.bfsDistances' SettleFoldRounds, chosen by the r19
    // fold-4-vs-8 A/B; ADVICE r17 — without the fold the anti-join
    // rescans every prior frontier leaf AND the logical plan doubles per
    // round); distances must be unaffected across MULTIPLE fold seals
    // (this path crosses two, at hops 8 and 16), including the source
    // layer folded first.
    val n = 21L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("s", "d")
    val got = operators.Graph.bfsDistances(edges, col("s"), col("d"),
      Seq(0L).toDF("n"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(i => i -> i).toMap)
  }

  // ---- pagerank -------------------------------------------------------

  test("pagerank gives the hub of a star more mass than its leaves") {
    // undirected star: center 0 <-> leaves 1..4
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("s", "d")
    val out = operators.Graph.pagerank(edges, col("s"), col("d"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 4L).forall(l => out(0L) > out(l)))
    // symmetric leaves score identically
    assert((2L to 4L).forall(l => out(l) == out(1L)))
  }

  test("labelPropagation: hand-replayed rounds, min tie-break, rounds=0 identity") {
    // triangle 1-2-3 with pendant 4 on node 3; labels start as node ids.
    // Round 1 by hand: 1 sees {2,3} (tie -> 2), 2 sees {1,3} -> 1,
    // 3 sees {1,2,4} -> 1, 4 sees {3} -> 3.
    // Round 2 from {1->2, 2->1, 3->1, 4->3}: 1 sees {1,1} -> 1,
    // 2 sees {2,1} (tie) -> 1, 3 sees {2,1,3} (tie) -> 1, 4 sees {1} -> 1.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    def run(r: Int) = operators.Graph.labelPropagation(edges, col("s"), col("d"), r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(0) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // duplicate/reversed edges collapse (distinct canonical edge set):
    // the neighbor-label COUNTS must not double
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    assert(operators.Graph.labelPropagation(dup, col("s"), col("d"), 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap == run(1))
  }

  test("labelPropagation: string node ids tie-break lexicographically (no numeric cast)") {
    // same triangle+pendant as above with letter ids — the min-label
    // tie-break must never negate/cast the label (a numeric-only trick
    // would null every string label); round-1 expectations mirror the
    // numeric test under 'a'<'b'<'c'<'d'
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")).toDF("s", "d")
    val out = operators.Graph.labelPropagation(edges, col("s"), col("d"), 1)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(out == Map("a" -> "b", "b" -> "a", "c" -> "a", "d" -> "c"), s"got $out")
  }

  test("labelPropagation: two separated cliques converge to per-clique min labels") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)))
      .toDF("s", "d")
    val out = operators.Graph.labelPropagation(edges, col("s"), col("d"), rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(n => out(n) == 1L), s"got $out")
    assert(Seq(10L, 11L, 12L, 13L).forall(n => out(n) == 10L), s"got $out")
  }

  test("pagerank duplicate edges collapse and iters=0 is uniform") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("s", "d")
    val out0 = operators.Graph.pagerank(edges, col("s"), col("d"), iters = 0)
      .collect().map(_.getDouble(1)).distinct
    assert(out0.toSeq == Seq(0.5))
    // duplicated 1->2 must not double 2's mass: symmetric 2-cycle stays
    // symmetric after an iteration
    val out1 = operators.Graph.pagerank(edges, col("s"), col("d"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out1(1L) == out1(2L))
  }

  test("pagerank is invariant to input partitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("s", "d")
    val a = operators.Graph.pagerank(edges, col("s"), col("d"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = operators.Graph.pagerank(edges.repartition(5), col("s"), col("d"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  // ---- bm25 -----------------------------------------------------------

  test("bm25 ranks higher-tf shorter docs first and respects k") {
    val docs = Seq(
      (1L, "join join join pad"),
      (2L, "join pad pad pad pad pad pad pad"),
      (3L, "pad pad pad pad"),
      (4L, "join join pad pad")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("join"), k = 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    // doc 1: tf=3 dl=4; doc 4: tf=2 dl=4; doc 2: tf=1 dl=8 — top-2 is 1 then 4
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 4L))
    assert(out.map(r => r.getInt(6)).toSeq == Seq(1, 2))
    // df counts docs containing the term (3), not occurrences (6)
    assert(out.head.getLong(3) == 3L)
  }

  test("bm25 idf favors rarer terms at equal tf/dl") {
    val docs = Seq(
      (1L, "common rare x x"),
      (2L, "common x x x"),
      (3L, "common x x x")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, col("doc_id"), col("text"), Seq("common", "rare"))
      .where(col("doc_id") === 1L).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(out("rare") > out("common"))
  }

  // ---- pmi ------------------------------------------------------------

  test("phraseSearch matches consecutive tokens only; overlaps count; 3-term phrases chain") {
    val docs = Seq(
      (1L, "spark sql engine"),        // match at 0
      (2L, "sql spark engine"),        // out of order: no match
      (3L, "a spark sql and spark sql b"), // two matches, first at 1
      (4L, "spark a sql"),             // gap: no match
      (5L, "a a a"))                   // overlap corpus for "a a"
      .toDF("doc_id", "text")
    def run(phrase: String*) =
      Retrieval.phraseSearch(docs, col("doc_id"), col("text"), phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run("spark", "sql") == Set((1L, 1L, 0), (3L, 2L, 1)))
    // overlapping occurrences each count
    assert(run("a", "a") == Set((5L, 2L, 0)))
    // 3-term phrase anchors at the first term
    assert(run("spark", "sql", "engine") == Set((1L, 1L, 0)))
    assert(run("nope", "sql").isEmpty)
  }

  test("pmi lift separates attracting from repelling pairs") {
    // a,b always together (4 docs); c alone in 4 other docs; filler 'z'
    // everywhere keeps all tokens in the top-N vocabulary.
    val docs = (1 to 4).map(i => (i.toLong, "a b z")) ++
      (5 to 8).map(i => (i.toLong, "c z"))
    val out = Retrieval.pmiPairs(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
      topN = 10, limit = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // lift(a,b) = 8*4/(4*4) = 2.0 ; lift(a,z) = 8*4/(4*8) = 1.0
    assert(out((("a"), ("b"))) == 2.0)
    assert(out((("a"), ("z"))) == 1.0)
    // (a,c) never co-occur: no row at all
    assert(!out.contains(("a", "c")))
  }

  // ---- kmeans ---------------------------------------------------------

  private def blobs = {
    // two tight blobs far apart; ids 1,2 (blob A) seed both init centroids
    // of k=2 when k picks lowest ids — iteration must still separate them.
    val a = Seq(1L -> 0.0, 2L -> 0.1, 3L -> 0.05, 4L -> 0.02)
    val b = Seq(11L -> 100.0, 12L -> 100.1, 13L -> 100.05)
    (a ++ b).map { case (id, x) => (id, Seq(x.toFloat, (x + 1).toFloat)) }
      .toDF("id", "vec")
  }

  test("kmeans separates well-spread blobs and assigns every point once") {
    val out = Clustering.kmeansAssign(blobs, col("id"), col("vec"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.size == 7)
    val aCl = Set(1L, 2L, 3L, 4L).map(out)
    val bCl = Set(11L, 12L, 13L).map(out)
    assert(aCl.size == 1 && bCl.size == 1 && aCl != bCl)
  }

  test("kmeans iters=0 assigns to the lowest-id init centroids directly") {
    val out = Clustering.kmeansAssign(blobs, col("id"), col("vec"), k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // init centroids are vectors of ids 1 (cl 0) and 2 (cl 1); id 1 is its
    // own centroid at distance 0
    assert(out(1L)._1 == 0 && out(1L)._2 == 0.0)
    assert(out(2L)._1 == 1 && out(2L)._2 == 0.0)
    // the far blob is closer to 0.1 (cl 1) than 0.0 (cl 0)
    assert(Set(11L, 12L, 13L).forall(out(_)._1 == 1))
  }

  test("kmeans is invariant to input partitioning") {
    val a = Clustering.kmeansAssign(blobs, col("id"), col("vec"), k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    val b = Clustering.kmeansAssign(blobs.repartition(7), col("id"), col("vec"),
      k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("kmeans keeps the previous centroid for an emptied cluster") {
    // k=2 over two identical points: init centroids equal; every point
    // ties to cl 0, cluster 1 empties — the run must not throw and all
    // points stay in cluster 0 with a finite d2.
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val out = Clustering.kmeansAssign(df, col("id"), col("vec"), k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.forall(_._2 == 0) && out.length == 2)
  }

  test("kmeansSummary sizes sum to the corpus") {
    val out = Clustering.kmeansSummary(blobs, col("id"), col("vec"), k = 2, iters = 2)
      .agg(sum("n")).head().getLong(0)
    assert(out == 7L)
  }

  // ---- wave 3: transitions / baskets / scd2 / twap / cusum / attribution

  private def ev4(rows: (Long, String, Long, Long)*) =
    rows.toDF("u", "et", "tus", "eid")

  test("transitions pairs consecutive events per key and row-normalizes") {
    // u1: a->b->a ; u2: a->b. Transitions: a->b ×2, b->a ×1.
    val events = ev4((1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "b", 20L, 5L))
    val out = Analytics.transitions(events, col("u"), col("et"), col("tus"), col("eid"))
      .orderBy("from_et", "to_et").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions breaks equal timestamps by the tie-break column") {
    // both orderings of the tie produce DIFFERENT pairs; eid pins one
    val events = ev4((1L, "a", 10L, 1L), (1L, "b", 10L, 2L), (1L, "c", 20L, 3L))
    val out = Analytics.transitions(events, col("u"), col("et"), col("tus"), col("eid"))
      .orderBy("from_et").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("a", "b"), ("b", "c")))
  }

  test("cooccurrence ignores item multiplicity and computes lift from basket counts") {
    // 4 baskets; a,b together in 2 (b listed twice in basket 1 — must not
    // inflate); a appears in 3, b in 2 → lift(a,b) = 2*4/(3*2) = 4/3.
    val rows = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "c")).toDF("bk", "it")
    val out = Analytics.cooccurrence(rows, col("bk"), col("it"), minPairs = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("a", "b", 2L, 0.5, 4.0 / 3.0)))
  }

  test("cooccurrence minPairs filters singleton pairs") {
    val rows = Seq((1L, "a"), (1L, "b")).toDF("bk", "it")
    assert(Analytics.cooccurrence(rows, col("bk"), col("it"), minPairs = 2L).count() == 0L)
    assert(Analytics.cooccurrence(rows, col("bk"), col("it"), minPairs = 1L).count() == 1L)
  }

  test("scd2 chains validity intervals and flags only the last row current") {
    val ch = ev4((1L, "x", 10L, 1L), (1L, "y", 20L, 2L), (1L, "z", 20L, 3L))
    val out = Analytics.scd2(ch, col("u"), col("tus"), col("eid"),
      Seq("et" -> col("et")))
      .orderBy("valid_from_us", "et")
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3), r.getString(4)))
    // equal-ts changes at 20 are ordered by eid: y then z; y's interval is
    // zero-length [20,20), z is current
    assert(out.toSeq == Seq((10L, 20L, false, "x"), (20L, 20L, false, "y"),
      (20L, -1L, true, "z")))
  }

  test("timeWeightedAvg: all-sub-second key gets NULL twap, not an ANSI throw") {
    // every gap < 1s floors dur_s to 0 -> dur_total_s = 0 exactly; the
    // unguarded division crashed under ANSI (the pearson class)
    val events = Seq(
      (1L, 0L, 1L, 10.0), (1L, 400000L, 2L, 20.0), (1L, 900000L, 3L, 30.0),
      (2L, 0L, 4L, 5.0), (2L, 2000000L, 5L, 7.0)).toDF("u", "tus", "eid", "v")
    val r = Analytics.timeWeightedAvg(events, col("u"), col("tus"), col("eid"), col("v"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(2) == 0L && r(1L).isNullAt(4), "degenerate key -> NULL twap")
    assert(r(2L).getDouble(4) == 5.0, "normal key unchanged")
  }

  test("timeWeightedAvg weights by whole-second holding durations; last obs drops") {
    // u1: v=10 held 2s, v=20 held 1s, v=99 last (no duration) →
    // twap = (10*2 + 20*1) / 3
    val events = Seq((1L, 0L, 1L, 10.0), (1L, 2 * us, 2L, 20.0),
      (1L, 3 * us, 3L, 99.0)).toDF("u", "tus", "eid", "v")
    val r = Analytics.timeWeightedAvg(events, col("u"), col("tus"), col("eid"),
      col("v")).head()
    assert(r.getLong(1) == 2L)          // n_intervals
    assert(r.getLong(2) == 3L)          // dur_total_s
    assert(r.getDouble(4) == 40.0 / 3)  // twap
  }

  test("timeWeightedAvg truncates sub-second durations (integral seconds)") {
    val events = Seq((1L, 0L, 1L, 10.0), (1L, 1500000L, 2L, 20.0),
      (1L, 3 * us, 3L, 0.0)).toDF("u", "tus", "eid", "v")
    val r = Analytics.timeWeightedAvg(events, col("u"), col("tus"), col("eid"),
      col("v")).head()
    // 1.5s → 1s, 1.5s → 1s
    assert(r.getLong(2) == 2L)
  }

  test("cusumDaily: scaled deviations sum to zero over the full series") {
    val day = 86400000000L
    val events = Seq(("g", 0L, 10.0), ("g", day, 20.0))
      .toDF("grp", "tus", "v")
    val out = Analytics.cusumDaily(events, col("grp"), col("tus"), col("v"))
      .orderBy("day").collect().map(_.getDouble(3))
    // day0 dev = 10*2 - 30*1 = -10; day1 adds 20*2 - 30*1 = +10 → 0
    assert(out.toSeq == Seq(-10.0, 0.0))
  }

  test("attributionLinear shares value equally among in-horizon touches only") {
    val events = Seq(
      (1L, "click", 0L, 1L, 0.0),        // in horizon (boundary inclusive)
      (1L, "click", 50L, 2L, 0.0),       // in horizon
      (1L, "click", 100L, 3L, 0.0),      // AT conversion ts → excluded (strict before)
      (1L, "click", -1L, 4L, 0.0),       // before horizon start → excluded
      (1L, "purchase", 100L, 5L, 30.0))
      .toDF("u", "et", "tus", "eid", "v")
    val out = Analytics.attributionLinear(events, col("u"), col("et"),
      col("tus"), col("eid"), col("v"), "purchase", "click", horizonMicros = 100L)
      .orderBy("touch_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 2L, 15.0), (2L, 2L, 15.0)))
  }

  test("topPaths builds ordered paths, truncates at maxLen, cuts exactly k by total order") {
    // u1,u2: a>b ; u3: b>a ; u4: a>b>c>d (maxLen=3 truncates to a>b>c)
    val events = ev4(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L),
      (2L, "a", 10L, 3L), (2L, "b", 20L, 4L),
      (3L, "b", 10L, 5L), (3L, "a", 20L, 6L),
      (4L, "a", 10L, 7L), (4L, "b", 20L, 8L), (4L, "c", 30L, 9L), (4L, "d", 40L, 10L))
    val out = Analytics.topPaths(events, col("u"), col("et"), col("tus"),
      col("eid"), maxLen = 3, k = 1)
      .orderBy("rk", "path").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a>b", 2L, 1)))
    // count ties resolve by path string (total order): k=2 keeps exactly
    // the lexicographically-first of the two count-1 paths
    val out2 = Analytics.topPaths(events, col("u"), col("et"), col("tus"),
      col("eid"), maxLen = 3, k = 2)
      .orderBy("rk", "path").collect().map(_.getString(0))
    assert(out2.toSeq == Seq("a>b", "a>b>c"))
  }

  test("pitJoin picks the dimension version valid at fact time") {
    // dim for key 1: A@[10,20), B@[20,∞). Facts: t=5 (pre-history →
    // dropped), t=15 (A), t=20 (B — valid_from inclusive), t=19 (A —
    // valid_to exclusive), key 9 unknown (dropped).
    val dim = Analytics.scd2(
      ev4((1L, "A", 10L, 1L), (1L, "B", 20L, 2L)),
      col("u"), col("tus"), col("eid"), Seq("et" -> col("et")))
    val facts = Seq((1L, 100L, 5L), (1L, 101L, 15L), (1L, 102L, 20L),
      (1L, 103L, 19L), (9L, 104L, 15L)).toDF("u", "fid", "fts")
    val out = Analytics.pitJoin(facts, col("u"), col("fts"),
        dim, col("k"), col("valid_from_us"), col("valid_to_us"))
      .orderBy("fid").collect().map(r => (r.getAs[Long]("fid"), r.getAs[String]("et")))
    assert(out.toSeq == Seq((101L, "A"), (102L, "B"), (103L, "A")))
  }

  test("ewma: recurrence, alpha=1 identity, single-point series, order by ord not arrival") {
    // hand-fold, alpha=0.5: x = 4, 8, 6 -> e = 4, 6, 6
    val df = Seq(("k", 3L, 6.0), ("k", 1L, 4.0), ("k", 2L, 8.0), ("j", 9L, 7.0))
      .toDF("g", "o", "x")
    val out = Analytics.ewma(df.repartition(5), col("g"), col("o"), col("x"), 0.5)
      .orderBy("k", "ord").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq(("j", 9L, 7.0),
      ("k", 1L, 4.0), ("k", 2L, 6.0), ("k", 3L, 6.0)))
    // alpha = 1 reproduces the input exactly (no smoothing)
    val id = Analytics.ewma(df, col("g"), col("o"), col("x"), 1.0)
      .orderBy("k", "ord").collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(id.forall { case (x, e) => x == e })
  }

  test("kaplanMeier life table: at-risk decrements, censoring, exact-zero tail") {
    // One cohort, 4 subjects: dur=1 event, dur=2 censored, dur=3 event ×2.
    // t=1: n=4 d=1 -> S=0.75; t=2: n=3 c=1 -> S=0.75; t=3: n=2 d=2 -> S=0.0
    // (d==n tail lands on exact 0.0 — the no-log-singularity contract).
    val subj = Seq(("c", 1L, true), ("c", 2L, false), ("c", 3L, true),
      ("c", 3L, true)).toDF("g", "dur", "obs")
    val out = Analytics.kaplanMeier(subj.repartition(3), col("g"), col("dur"),
        col("obs")).orderBy("dur").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq((1L, 4L, 1L, 0L, 0.75), (2L, 3L, 0L, 1L, 0.75),
      (3L, 2L, 2L, 0L, 0.0)))
  }

  test("ksTest2: exact D on a hand CDF; identical samples give D=0") {
    // s1 = {1,2}, s2 = {2,3}: diffs at v=1: |1/2-0|=.5, v=2: |1-1/2|=.5,
    // v=3: 0. D=0.5 attained first at v=1.
    val df = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, false))
      .toDF("v", "s")
    val r = Analytics.ksTest2(df.repartition(4), col("v"), col("s")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      ((2L, 2L, 0.5, 1.0)))
    val same = Analytics.ksTest2(
      Seq((1.0, true), (1.0, false), (5.0, true), (5.0, false)).toDF("v", "s"),
      col("v"), col("s")).collect()(0)
    assert(same.getDouble(2) == 0.0)
  }

  test("itemNeighbors: cosine from co-occurrence, k cut, minPairs floor, symmetry") {
    // baskets: {a,b} ×2, {a,c} ×1 -> cnt a=3,b=2,c=1; pair (a,b) cooc=2
    // cos=2/sqrt(6); (a,c) cooc=1 < minPairs=2 dropped.
    val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "c"))
      .toDF("bk", "it")
    val out = Analytics.itemNeighbors(df.repartition(3), col("bk"), col("it"),
        k = 5, minPairs = 2).orderBy("item").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    val c = 2.0 / math.sqrt(6.0)
    assert(out.toSeq == Seq(("a", "b", 2L, c, 1), ("b", "a", 2L, c, 1)))
  }

  test("wave-3 operators are invariant to input partitioning") {
    val events = ev4(
      (1L, "a", 10L, 1L), (1L, "b", 10L, 2L), (1L, "a", 30L, 3L),
      (2L, "b", 5L, 4L), (2L, "a", 5L, 5L), (2L, "b", 40L, 6L),
      (3L, "c", 7L, 7L))
    def run(df: org.apache.spark.sql.DataFrame) = Seq(
      Analytics.transitions(df, col("u"), col("et"), col("tus"), col("eid"))
        .orderBy("from_et", "to_et").collect().toSeq,
      Analytics.topPaths(df, col("u"), col("et"), col("tus"), col("eid"), 3, 2)
        .orderBy("rk", "path").collect().toSeq,
      Analytics.scd2(df, col("u"), col("tus"), col("eid"), Seq("et" -> col("et")))
        .orderBy("k", "valid_from_us", "et").collect().toSeq)
    assert(run(events.repartition(7)) == run(events.coalesce(1)))
  }
}
