package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Blocked Levenshtein join: complete length-band blocking (bucket width
  * maxDist+1, probe replicated to the 3 adjacent buckets), candidates by
  * hash equi-join, threshold-bounded exact verification. Equality with
  * the naive all-pairs filter is the contract; the plan shape (no nested
  * loop) is the point.
  */
class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  // Variable lengths on purpose: insertions/deletions move strings across
  // length buckets, so cross-bucket candidate generation is exercised.
  private def corpus() = Seq(
    (1L, "spark"), (2L, "spork"), (3L, "sparks"), (4L, "park"),
    (5L, "shark"), (6L, "sharks"), (7L, "a"), (8L, ""),
    (9L, "completely unrelated text"), (10L, "completely unrelated texts"),
    (11L, null.asInstanceOf[String]), (12L, "spark")
  ).toDF("id", "t")

  private def naivePairs(maxDist: Int): Set[(Long, Long, Int)] = {
    val rows = corpus().where(col("t").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      d = levenshteinRef(ta, tb) if d <= maxDist
    } yield (a, b, d)).toSet
  }

  /** Textbook DP reference, independent of both engines. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def got(maxDist: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.selfJoin(corpus(), col("id"), col("t"), maxDist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("selfJoin equals the naive all-pairs filter at maxDist 1 and 2, each pair once") {
    for (d <- Seq(1, 2)) {
      val expected = naivePairs(d)
      val res = FuzzyJoin.selfJoin(corpus(), col("id"), col("t"), d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(res.toSet == expected, s"maxDist=$d")
      assert(res.length == res.toSet.size, s"duplicate pair emitted at maxDist=$d")
      assert(expected.nonEmpty)
    }
    // cross-bucket pair: "spark"(len 5, bucket 2 at w=2) vs "sparks"
    // (len 6, bucket 3) — found only through probe replication
    assert(got(1).contains((1L, 3L, 1)))
  }

  test("maxDist=0 degenerates to exact-equality pairs") {
    assert(got(0) == Set((1L, 12L, 0)))
  }

  test("plan: candidates come from a hash equi-join on the bucket, no nested loop") {
    val q = FuzzyJoin.selfJoin(corpus(), col("id"), col("t"), 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected an equi-join plan, got:\n$plan")
  }

  test("two-sided join equals the naive bipartite filter") {
    val left = Seq((100L, "spark"), (101L, "zebra"), (102L, null.asInstanceOf[String]))
      .toDF("lid", "lt")
    val expected = (for {
      (a, ta) <- Seq(100L -> "spark", 101L -> "zebra")
      r <- corpus().where(col("t").isNotNull).collect()
      d = levenshteinRef(ta, r.getString(1)) if d <= 2
    } yield (a, r.getLong(0), d)).toSet
    val res = FuzzyJoin.join(left, col("lid"), col("lt"),
        corpus(), col("id"), col("t"), maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res == expected)
    assert(res.exists(_._1 == 100L) && !res.exists(_._1 == 101L))
    // the deletion-blocked bipartite form claims the same contract
    val del = FuzzyJoin.joinDeletions(left, col("lid"), col("lt"),
        corpus(), col("id"), col("t"), maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(del.toSet == expected)
    assert(del.length == del.toSet.size, "duplicate pair emitted")
  }

  test("selfJoinDeletions equals selfJoin on the mixed corpus and a one-length-class corpus") {
    for (d <- Seq(0, 1, 2)) {
      val del = FuzzyJoin.selfJoinDeletions(corpus(), col("id"), col("t"), d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(del.toSet == naivePairs(d), s"maxDist=$d")
      assert(del.length == del.toSet.size, s"duplicate pair at maxDist=$d")
    }
    // the corpus shape length bands cannot block: every key the same
    // length (one band = all rows). Deletion neighborhoods still bucket it.
    val sameLen = (0L until 50L).map(i => (i, f"key-$i%03d")).toDF("id", "t")
    val expected = (for {
      a <- 0L until 50L; b <- 0L until 50L if a < b
      d = levenshteinRef(f"key-$a%03d", f"key-$b%03d") if d <= 1
    } yield (a, b, d)).toSet
    val res = FuzzyJoin.selfJoinDeletions(sameLen, col("id"), col("t"), 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res == expected && expected.nonEmpty)
  }

  test("selfJoinDeletions: equi-join plan, extraBlock composes, k bound enforced") {
    val q = FuzzyJoin.selfJoinDeletions(corpus(), col("id"), col("t"), 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected an equi-join plan, got:\n$plan")
    val df = Seq((1L, "spark", "en"), (2L, "spork", "en"), (3L, "sparc", "de"))
      .toDF("id", "t", "lang")
    val res = FuzzyJoin.selfJoinDeletions(df, col("id"), col("t"), 1,
        extraBlock = Some(col("lang"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((1L, 2L)))
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoinDeletions(corpus(), col("id"), col("t"), 3)
    }
  }

  test("selfJoinAuto: corpus-derived strategy choice, output identical either way") {
    // one dominant length class -> deletions; spread lengths -> bands
    val sameLen = (0L until 30L).map(i => (i, f"key-$i%03d")).toDF("id", "t")
    assert(FuzzyJoin.preferDeletionBlocking(sameLen, col("t"), 1))
    assert(!FuzzyJoin.preferDeletionBlocking(corpus(), col("t"), 1),
      "mixed-length corpus keeps the band join")
    // long keys and k > 2 refuse the deletion path regardless of shape
    val longKeys = (0L until 10L).map(i => (i, "x" * 100 + i)).toDF("id", "t")
    assert(!FuzzyJoin.preferDeletionBlocking(longKeys, col("t"), 1))
    assert(!FuzzyJoin.preferDeletionBlocking(sameLen, col("t"), 3))
    // empty corpus: no preference, and the auto join returns empty not a crash
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    assert(!FuzzyJoin.preferDeletionBlocking(empty, col("t"), 1))
    assert(FuzzyJoin.selfJoinAuto(empty, col("id"), col("t"), 1).count() == 0)
    // and on both corpus shapes the auto result equals the naive filter
    val auto = FuzzyJoin.selfJoinAuto(corpus(), col("id"), col("t"), 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(auto == naivePairs(1))
  }

  test("extraBlock sharpens blocking: matches only within equal block values") {
    val df = Seq((1L, "spark", "en"), (2L, "spork", "en"), (3L, "sparc", "de"))
      .toDF("id", "t", "lang")
    val res = FuzzyJoin.selfJoin(df, col("id"), col("t"), 1,
        extraBlock = Some(col("lang"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == Set((1L, 2L))) // 1–3 is within distance but blocked apart
  }
}
