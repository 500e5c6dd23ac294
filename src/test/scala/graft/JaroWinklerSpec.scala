package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JaroWinklerFunctions, JaroWinklerKernel}

/** The codegen'd JaroWinkler expression. The pinned doubles below are
  * DuckDB 1.x `jaro_winkler_similarity` outputs captured this round — the
  * kernel was swept bit-exact against DuckDB on 270k+ random pairs
  * (short/long/unicode, both argument orders); these fixtures keep the
  * pinned semantics from regressing without DuckDB in the loop.
  */
class JaroWinklerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def k(a: String, b: String): Double =
    JaroWinklerKernel.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook and DuckDB-pinned fixtures, raw bits") {
    def pin(a: String, b: String, expected: Double): Unit =
      assert(java.lang.Double.doubleToRawLongBits(k(a, b)) ==
        java.lang.Double.doubleToRawLongBits(expected), s"jw($a, $b)")
    pin("MARTHA", "MARHTA", 0.9611111111111111)      // classic transposition
    pin("DIXON", "DICKSONX", 0.8133333333333332)     // prefix boost, len skew
    pin("JELLYFISH", "SMELLYFISH", 0.8962962962962964) // no common prefix
    pin("DwAyNE", "DuANE", 0.8400000000000001)       // case-sensitive
    pin("abc", "abc", 1.0)
    pin("a", "a", 1.0)
    pin("", "abc", 0.0)                               // either empty -> 0
    pin("", "", 0.0)                                  // BOTH empty -> 0 (DuckDB)
    pin("ab", "ba", 0.0)                              // window 0: no matches
    // integer half-transposition: 5 mismatched aligned pairs -> t = 2,
    // NOT 2.5 — the variant split where DuckDB truncates
    pin("bacaab", "ababcb", 0.7555555555555555)
    // byte-level semantics: the é is two bytes, so m = 3 of 5-vs-4 BYTES
    pin("caf\u00e9", "cafe", 0.8483333333333334)
    // prefix boost caps at 4 even with a 17-byte common prefix
    pin("Customer#000000001", "Customer#000000010", 0.9888888888888889)
    // boost only above 0.7: shared prefix but low jaro stays unboosted
    pin("AXXXXX", "AYYYY", 0.45555555555555555)
  }

  test("kernel is symmetric and bounded on random pairs") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc#0"
    for (_ <- 1 to 5000) {
      val a = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      val ab = k(a, b)
      assert(java.lang.Double.doubleToRawLongBits(ab) ==
        java.lang.Double.doubleToRawLongBits(k(b, a)), s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range on ($a, $b)")
      if (a == b && a.nonEmpty) assert(ab == 1.0, s"self != 1 on $a")
    }
  }

  test("expression: null flow, codegen path, SQL registry") {
    val df = Seq((Some("MARTHA"), Some("MARHTA")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    val out = df.select(JaroWinklerFunctions.jaroWinkler($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0)))
    assert(out(0) == 0.9611111111111111 && out(1) == null && out(2) == null)
    // stays inside whole-stage codegen (the *(n) span marker) — assert on
    // a parquet-backed scan: no exchange, so no AQE deferral, and
    // ConvertToLocalRelation cannot fold the fixture away
    val pq = java.nio.file.Files.createTempDirectory("jw_plan").toString
    df.write.mode("overwrite").parquet(pq)
    val plan = spark.read.parquet(pq)
      .select(JaroWinklerFunctions.jaroWinkler($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("jw_sql")
    val sql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_sql WHERE a = 'MARTHA'")
      .collect()(0).getDouble(0)
    assert(sql == 0.9611111111111111)
    // non-string arguments fail at analysis, not at runtime
    val e = intercept[Exception] {
      spark.sql("SELECT jaro_winkler(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
