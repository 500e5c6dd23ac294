package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.operators.FuzzyJoin

/** Property sweep for the blocked Levenshtein join: on arbitrary
  * small-alphabet corpora (where near-misses are dense and length
  * clustering is adversarial for the bucketing), selfJoin must equal the
  * naive all-pairs DP filter EXACTLY — same pairs, same distances, no
  * duplicates — for every threshold. Small alphabets maximize edge
  * cases: empty strings, equal strings, chains of distance-1 neighbors,
  * and pairs that straddle length-bucket boundaries.
  */
object FuzzyJoinProps extends Properties("FuzzyJoin") {

  // Spark jobs per case are the cost: fewer, nastier cases beat many
  // trivial ones.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 12)

  private lazy val spark = SparkTest.session

  private def levRef(a: String, b: String): Int = {
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

  private val genWord: Gen[String] =
    Gen.choose(0, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  private val genCase: Gen[(List[String], Int)] = for {
    n <- Gen.choose(4, 12)
    words <- Gen.listOfN(n, genWord)
    d <- Gen.choose(0, 3)
  } yield (words, d)

  property("selfJoin == naive all-pairs DP filter, no duplicate pairs") =
    forAllNoShrink(genCase) { case (words, maxDist) =>
      val sp = spark
      import sp.implicits._
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val expected = (for {
        (ia, wa) <- rows; (ib, wb) <- rows if ia < ib
        d = levRef(wa, wb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      val got = FuzzyJoin.selfJoin(rows.toDF("id", "t"), col("id"), col("t"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      got.toSet == expected && got.length == got.toSet.size
    }

  // The deletion-neighborhood blocking claims the SAME output contract;
  // small alphabets are adversarial here too (dense multi-variant
  // collisions like "ab"/"ba", empty strings whose neighborhood is {""},
  // distance-1 chains). k capped at 2 = the operator's supported range.
  property("selfJoinDeletions == naive all-pairs DP filter, no duplicate pairs") =
    forAllNoShrink(genCase) { case (words, d) =>
      val maxDist = math.min(d, 2)
      val sp = spark
      import sp.implicits._
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val expected = (for {
        (ia, wa) <- rows; (ib, wb) <- rows if ia < ib
        dd = levRef(wa, wb) if dd <= maxDist
      } yield (ia, ib, dd)).toSet
      val got = FuzzyJoin.selfJoinDeletions(rows.toDF("id", "t"), col("id"), col("t"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      got.toSet == expected && got.length == got.toSet.size
    }
}
