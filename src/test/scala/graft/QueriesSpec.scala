package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract smoke: every `queries` entry runs end-to-end at
  * sf0.001 (the driver's smoke scale) and the oracle map stays consistent
  * with the query map. The value-level correctness gate is the DuckDB
  * compare (tools/compare_oracle.py at sf0.01); this spec catches
  * breakage early and cheaply.
  */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assume(new java.io.File(sfDir).isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  // VERDICT r10 #5: "rows-only" is a deliberate, closed set, not a gap.
  // Every query outside `permanentRowsOnly` must carry DuckDB oracle SQL,
  // and every member must NOT (a member growing an oracle should be
  // promoted out of the set, not silently double-listed).
  test("oracle coverage: queries partition into oracled + permanentRowsOnly") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == SparkEntry.permanentRowsOnly,
      s"rows-only drift: unoracled-but-not-declared=${unoracled -- SparkEntry.permanentRowsOnly}, " +
        s"declared-but-oracled=${SparkEntry.permanentRowsOnly -- unoracled}")
    val phantom = SparkEntry.permanentRowsOnly -- SparkEntry.queries.keySet
    assert(phantom.isEmpty, s"permanentRowsOnly names unknown queries: $phantom")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      assume(new java.io.File(sfDir).isDirectory)
      val df = fn(spark, sfDir)
      val n = df.count()
      // LSH/near-dup candidate queries may legitimately find nothing at this
      // scale; everything else must produce rows. q_kcore: the sf0.001
      // co-occurrence graph is K10 (max degree 9 < k=22), so the true
      // 22-core is empty — the fixpoint, not a bug.
      val mayBeEmpty = Set("q_dedup_minhash", "q_dedup_simhash", "q_sim_ann",
        "q_ngram_jaccard", "q_set_ops", "q_anti_join", "q_kcore")
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
