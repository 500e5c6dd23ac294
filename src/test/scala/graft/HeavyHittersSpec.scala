package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.operators.TextAnalysis

/** Misra–Gries frequent items: the n/(capacity+1) candidate guarantee
  * under ANY partitioning / merge order, and the exact two-pass
  * heavy-hitters query built on it.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  /** Deterministic skewed stream: term t_i appears ~ n/(i+1) times
    * (Zipf-ish), interleaved so hot terms aren't contiguous.
    */
  private def stream(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (pos <- 0 until 5000; i <- 0 until 40 if pos % (i + 1) == 0)
      out += s"t$i"
    out.toSeq
  }

  test("candidate superset + bound hold across partitionings and merge orders") {
    val data = stream()
    val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = data.size.toLong
    val k = 10
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    for (parts <- Seq(1, 3, 8)) {
      val summary = data.toDF("term").repartition(parts)
        .agg(mg(col("term")).as("mg"))
        .select(explode(col("mg.items")).as("e"))
        .select(col("e.term"), col("e.cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(summary.size <= k)
      // every estimate is a lower bound within n/(k+1) of the truth
      summary.foreach { case (t, est) =>
        val f = exact(t)
        assert(est <= f && est >= f - n / (k + 1.0) - 1e-9, s"parts=$parts term=$t")
      }
      // every true heavy hitter survives
      exact.filter(_._2 > n / (k + 1.0)).keys.foreach { t =>
        assert(summary.contains(t), s"parts=$parts lost heavy hitter $t") }
    }
  }

  test("heavyHitters is exact and partitioning-invariant") {
    val data = stream()
    val n = data.size.toLong
    val k = 10
    val expected = data.groupBy(identity)
      .collect { case (t, xs) if xs.size > n / (k + 1.0) => t -> xs.size.toLong }
      .toMap
    assert(expected.nonEmpty)
    for (parts <- Seq(1, 5)) {
      // one doc per token plus some null docs the pass must ignore
      val docs = (data.map(t => Option(t)) ++ Seq.fill(7)(Option.empty[String]))
        .toDF("text").repartition(parts)
      val got = TextAnalysis.heavyHitters(docs, col("text"), k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("candidate filter is a broadcast semi-join, plan-stable at capacity 10^4") {
    // isin(cands) inlines one literal per candidate — plan bloat that
    // grows with capacity; the semi-join keeps the plan O(1). Exercised
    // at the capacity tier where the difference matters.
    val docs = (1 to 2000).map(i => s"w${i % 500}").toDF("text")
    val q = TextAnalysis.heavyHitters(docs, col("text"), 10000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate filter must be a broadcast semi-join, plan:\n${plan.take(2000)}")
    assert(!plan.contains(" IN ("), "no inlined candidate literal list")
    // capacity >= vocabulary: sketch is exact, so every term survives
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 500 && got.values.forall(_ == 4L))
  }

  test("capacity >= distinct terms degenerates to exact counting in the sketch") {
    val data = Seq("a", "b", "a", "c", "a", "b")
    val mg = udaf(new MisraGries(10), Encoders.STRING)
    val summary = data.toDF("term").repartition(2)
      .agg(mg(col("term")).as("mg"))
      .select(explode(col("mg.items")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
