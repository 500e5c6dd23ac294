package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of (point-in-time) join: latest right row at-or-before each left
  * row per key, via the union-window form — one keyed shuffle, never a
  * nested-loop range join.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def left = Seq(
    (1L, 5L, "a"),   // after right@4 → x
    (1L, 9L, "b"),   // ties right@9 → y (at-or-before includes equality)
    (1L, 100L, "c"), // after right@9 → y still
    (2L, 3L, "d"),   // before 2's only right@99 → unmatched
    (3L, 7L, "e")    // key with no right rows at all
  ).toDF("k", "t", "lv")

  private def right = Seq(
    (1L, 4L, "x"), (1L, 9L, "y"), (2L, 99L, "z")
  ).toDF("k", "rt", "rv")

  test("left as-of join: latest at-or-before match, null when none") {
    val r = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "left")
      .orderBy("k", "t").collect()
    assert(r.toSeq == Seq(
      Row(1L, 5L, "a", 4L, "x"),
      Row(1L, 9L, "b", 9L, "y"),
      Row(1L, 100L, "c", 9L, "y"),
      Row(2L, 3L, "d", null, null),
      Row(3L, 7L, "e", null, null)))
  }

  test("inner as-of join drops unmatched left rows") {
    val r = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "inner")
      .orderBy("k", "t").collect()
    assert(r.map(_.getString(2)).toSeq == Seq("a", "b", "c"))
  }

  test("tolerance bounds staleness: inclusive, nulls under left, drops under inner") {
    // tol=1: (1,5) match@4 age 1 KEPT (inclusive); (1,9) match@9 age 0
    // kept; (1,100) match@9 age 91 nulled; unmatched rows unchanged
    val l = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "left",
      tolerance = Some(1.0)).orderBy("k", "t").collect()
    assert(l.toSeq == Seq(
      Row(1L, 5L, "a", 4L, "x"),
      Row(1L, 9L, "b", 9L, "y"),
      Row(1L, 100L, "c", null, null),
      Row(2L, 3L, "d", null, null),
      Row(3L, 7L, "e", null, null)))
    val i = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "inner",
      tolerance = Some(1.0)).orderBy("k", "t").collect()
    assert(i.map(_.getString(2)).toSeq == Seq("a", "b"))
    // tol=0: only exact-time matches survive
    val z = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "inner",
      tolerance = Some(0.0)).collect()
    assert(z.map(_.getString(2)).toSeq == Seq("b"))
    // composes with the hot-key bucket pre-split: identical output
    val bucketed = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "left",
      timeBucketWidth = Some(10.0), tolerance = Some(1.0))
      .orderBy("k", "t").collect()
    assert(bucketed.toSeq == l.toSeq)
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "left",
        tolerance = Some(-1.0))
    }
  }

  test("plan is a single keyed window — no nested-loop or cartesian join") {
    val q = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "rt", "left")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range-join blowup in plan:\n$plan")
    assert(plan.contains("Window"), s"expected the union-window form in:\n$plan")
  }

  test("timeBucketWidth pre-split: identical results, hot key spread over many window partitions") {
    // One key owns 90% of the rows — the r3-flagged straggler shape: with
    // a plain (key)-partitioned window all 900 rows land in ONE task.
    val rnd = new scala.util.Random(31)
    val ls = (0 until 900).map(i => (7L, rnd.nextInt(1000).toLong, i.toLong)) ++
      (900 until 1000).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rs = Seq.tabulate(60)(i => (7L, i * 17L, 1000L + i)) ++
      Seq.tabulate(20)(i => (i % 5L, i * 50L, 2000L + i))
    val lDf = ls.toDF("k", "t", "lid")
    val rDf = rs.toDF("k", "rt", "rid")

    val plain = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "left")
    val bucketed = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "left",
      timeBucketWidth = Some(100.0))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(m(bucketed) == m(plain))

    // the main window really partitions on (key, bucket): the hot key's
    // rows split across 10 bucket values instead of one partition
    val winSpecs = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec.length
    }
    assert(winSpecs.contains(2), s"expected a (key, bucket) window, specs=$winSpecs")
    val hotBuckets = ls.filter(_._1 == 7L).map(_._2 / 100).distinct.size
    assert(hotBuckets == 10, s"hot key should span 10 buckets, got $hotBuckets")

    // inner variant agrees too
    val pi = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "inner")
    val bi = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "inner",
      timeBucketWidth = Some(100.0))
    assert(m(bi) == m(pi))
  }

  test("timeBucketWidth: carry-in crosses empty buckets and seeds left-only buckets") {
    // right rows only in bucket 0; left rows in buckets 3 and 9 — every
    // match must ride the carry chain across empty buckets.
    val lDf = Seq((1L, 350L, "a"), (1L, 990L, "b"), (2L, 500L, "c"))
      .toDF("k", "t", "lv")
    val rDf = Seq((1L, 10L, "x"), (1L, 40L, "y")).toDF("k", "rt", "rv")
    val r = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "left",
      timeBucketWidth = Some(100.0)).orderBy("k", "t").collect()
    assert(r.toSeq == Seq(
      Row(1L, 350L, "a", 40L, "y"),
      Row(1L, 990L, "b", 40L, "y"),
      Row(2L, 500L, "c", null, null)))
  }

  test("matches a reference nested-loop computation on random data") {
    val rnd = new scala.util.Random(17)
    val ls = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    // unique (k, rt) on the right, as the contract requires
    val rs = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val lDf = ls.toDF("k", "t", "lid")
    val rDf = rs.toDF("k", "rt", "rid")
    val got = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "t", "rt", "left")
      .collect().map(r => (r.getLong(2), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    val expected = ls.map { case (k, t, lid) =>
      val best = rs.filter(r => r._1 == k && r._2 <= t).sortBy(r => (r._2, -r._3)).lastOption
      lid -> best.map(_._3).getOrElse(-1L)
    }.toMap
    assert(got == expected)
  }
}
