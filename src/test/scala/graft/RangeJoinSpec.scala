package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketized point-in-interval join: equi-join on value buckets + exact
  * filter — never a nested-loop range join.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("matches the naive BETWEEN join on random data, exactly once per pair") {
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(400)((rnd.nextInt(1000).toLong, rnd.nextDouble() * 500.0))
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }.toDF("pid", "v")
    // interval lengths from 0 (degenerate point) to 10× the bucket width
    val ivals = Seq.tabulate(60) { i =>
      val lo = rnd.nextDouble() * 480.0
      (i.toLong, lo, lo + rnd.nextInt(11) * rnd.nextDouble() * 10.0)
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.pointInInterval(pts, ivals, "v", "lo", "hi", bucketWidth = 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = pts.join(ivals, $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == expected.sorted) // Seq (not Set) compare: no dup pairs either
    assert(got.nonEmpty)
  }

  test("boundaries are inclusive; inverted intervals drop; keys scope the match") {
    val pts = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 10.0)).toDF("pid", "g", "v")
    val ivals = Seq(("a", 10.0, 20.0, 100L), ("b", 50.0, 40.0, 101L)).toDF("g", "lo", "hi", "iid")
    val r = RangeJoin.pointInInterval(pts, ivals, "v", "lo", "hi",
        bucketWidth = 5.0, keys = Seq("g"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // both endpoints of [10,20] match; key g="b" sees only its (inverted,
    // dropped) interval
    assert(r == Set((1L, 100L), (2L, 100L)))
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    val a = (0L until 300L).map { i =>
      val lo = rnd.nextInt(1000).toDouble; (i, lo, lo + rnd.nextInt(40))
    }.toDF("a_id", "a_lo", "a_hi")
    val b = (0L until 300L).map { i =>
      val lo = rnd.nextInt(1000).toDouble; (i, lo, lo + rnd.nextInt(40))
    }.toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 25.0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Seq compare: the first-shared-bucket guard means no pair appears
    // twice even though overlapping intervals share many buckets
    assert(got.sorted == expected.sorted)
    assert(got.nonEmpty && got.size == got.distinct.size)
    // wide intervals spanning many buckets still emit once
    val wide = Seq((1L, 0.0, 990.0)).toDF("a_id", "a_lo", "a_hi")
    val w = RangeJoin.intervalOverlap(wide, b, "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 25.0)
    // exactly once per genuinely-overlapping b (those starting <= a_hi)
    assert(w.count() == b.where($"b_lo" <= 990.0).count())
  }

  test("plan is a hash equi-join on the bucket — no nested-loop") {
    val pts = spark.range(100).select($"id".as("pid"), ($"id" % 50).cast("double").as("v"))
    val ivals = spark.range(10).select($"id".as("iid"),
      ($"id" * 5.0).as("lo"), ($"id" * 5.0 + 7.0).as("hi"))
    val q = RangeJoin.pointInInterval(pts, ivals, "v", "lo", "hi", bucketWidth = 5.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop in plan:\n$plan")
    assert(q.count() > 0)
  }
}
