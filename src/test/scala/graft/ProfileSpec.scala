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
}
