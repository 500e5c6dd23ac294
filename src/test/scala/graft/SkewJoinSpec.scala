package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Why SkewJoin exists (VERDICT r2 #8): on a skewed key distribution the
  * salt genuinely SPREADS the hot key across reducers — and the factor×
  * build replication it pays for that is visible and bounded.
  */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("salting spreads a hot key over ~factor reducers; plain hashing cannot") {
    val hot = 1L
    // 20k rows on ONE key + a uniform tail: the AQE-resistant shape (the
    // matching build rows are also all on that key)
    val probe = ((0 until 20000).map(i => (hot, s"p$i")) ++
      (0 until 2000).map(i => (i.toLong + 10, s"u$i"))).toDF("k", "payload")
    val build = (0L until 3000L).map(i => (i, s"b$i")).toDF("bk", "battr")
    val factor = 4

    // cost side: the build shuffles factor× — deliberate and visible
    assert(SkewJoin.replicateBuild(build, factor).count() == factor * build.count())

    // benefit side: the hot key's rows split across (almost all) salts,
    // no salt carrying more than ~half the hot rows
    val saltCounts = SkewJoin.saltProbe(probe, factor).where($"k" === hot)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length >= factor - 1, s"expected ~$factor salts, got ${saltCounts.length}")
    assert(saltCounts.max < 20000 / 2, s"one salt still carries ${saltCounts.max} of 20000")

    // and therefore across distinct shuffle partitions of the (key, salt)
    // join key — while plain hash-partitioning on k puts ALL hot rows in
    // exactly one of the 32 reducers
    val spread = SkewJoin.saltProbe(probe, factor).where($"k" === hot)
      .select(pmod(hash($"k", $"__salt"), lit(32)).as("p")).distinct().count()
    val plainSpread = probe.where($"k" === hot)
      .select(pmod(hash($"k"), lit(32)).as("p")).distinct().count()
    assert(plainSpread == 1L)
    assert(spread >= 2L, s"salted hot key still lands in $spread partition(s)")

    // correctness: the salted join IS the plain join, row for row
    val plain = probe.join(build, $"k" === $"bk")
    val salted = SkewJoin.saltedInnerJoin(probe, build, $"k", $"bk", factor)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("autoSaltedInnerJoin derives the factor from the data and stays correct") {
    // skewed probe: one 500-row key + 99 singletons → joinKeySkew suggests
    // ceil(500/1) = 500, capped at maxFactor
    val probe = ((0 until 500).map(i => (1L, s"p$i")) ++
      (2 to 100).map(i => (i.toLong, s"u$i"))).toDF("k", "payload")
    val build = (0L until 200L).map(i => (i, s"b$i")).toDF("bk", "battr")
    val plain = probe.join(build, $"k" === $"bk")
    val auto = SkewJoin.autoSaltedInnerJoin(probe, build, $"k", $"bk", maxFactor = 8)
    assert(auto.count() == plain.count())
    assert(auto.exceptAll(plain).isEmpty && plain.exceptAll(auto).isEmpty)
    // the report suggests the uncapped 500; the cap bounds what the join
    // actually pays (equivalently: auto == explicit factor-8 salted join)
    assert(graft.operators.Profile.joinKeySkew(probe, $"k").head().getLong(7) == 500L)
    val explicit = SkewJoin.saltedInnerJoin(probe, build, $"k", $"bk", 8)
    assert(auto.exceptAll(explicit).isEmpty && explicit.exceptAll(auto).isEmpty)
    // benign distribution → suggestion (and thus factor) 1: plain join,
    // zero replication
    val even = (1L to 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    assert(graft.operators.Profile.joinKeySkew(even, $"k").head().getLong(7) == 1L)
    val benign = SkewJoin.autoSaltedInnerJoin(even, build, $"k", $"bk", maxFactor = 8)
    val benignPlain = even.join(build, $"k" === $"bk")
    assert(benign.exceptAll(benignPlain).isEmpty && benignPlain.exceptAll(benign).isEmpty)
  }
}
