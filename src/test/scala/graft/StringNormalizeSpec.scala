package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{StringNormalizeFunctions, UnicodeNormalizeKernel}

/** The codegen'd UnicodeNormalize expression: form semantics, null flow,
  * the allocation-free fast paths, and both activation paths (Column API
  * and the SQL registry).
  */
class StringNormalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val decomposed = "cafe\u0301"  // e + COMBINING ACUTE ACCENT
  private val composed = "caf\u00e9"     // precomposed \u00e9
  private val ligature = "\ufb01le"       // fi ligature + "le" - NFKC folds to "file"

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(StringNormalizeFunctions.unicodeNormalize($"t", form))
      .collect()(0).getString(0)

  test("NFC composes, NFD decomposes, NFKC/NFKD fold compatibility forms") {
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    assert(norm(ligature, "NFC") == ligature)    // canonical forms keep ligatures
    assert(norm(ligature, "NFKC") == "file")
    assert(norm(composed + ligature, "NFKD") == decomposed + "file")
  }

  test("null input, empty string, and pure ASCII pass through") {
    val out = Seq(Some("plain ascii"), Some(""), None).toDF("t")
      .select(StringNormalizeFunctions.unicodeNormalize($"t").as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("plain ascii", "", null))
  }

  test("kernel fast paths return the INPUT UTF8String (no reallocation)") {
    // JDK enum order is NFD, NFC, NFKD, NFKC — derive the ordinal from the
    // NAME like the expression does, never hardcode it
    val nfcOrd = java.text.Normalizer.Form.NFC.ordinal
    val ascii = UTF8String.fromString("only ascii here")
    assert(UnicodeNormalizeKernel.normalize(ascii, nfcOrd) eq ascii)
    // non-ASCII but already NFC: quick-check path, same instance back
    val nfc = UTF8String.fromString(composed)
    assert(UnicodeNormalizeKernel.normalize(nfc, nfcOrd) eq nfc)
    // actually-denormalized text is rebuilt
    val nfd = UTF8String.fromString(decomposed)
    assert(UnicodeNormalizeKernel.normalize(nfd, nfcOrd).toString == composed)
  }

  test("unknown form fails at construction, not per-row") {
    val e = intercept[IllegalArgumentException] {
      StringNormalizeFunctions.unicodeNormalize($"t", "NFX")
    }
    assert(e.getMessage.contains("NFX"))
  }

  test("SQL registry: 1-arg defaults to NFC, 2-arg takes a literal form") {
    GraftFunctions.register(spark)
    Seq(Tuple1(decomposed)).toDF("t").createOrReplaceTempView("sn_sql")
    val r = spark.sql(
      """SELECT unicode_normalize(t) AS nfc,
        |       unicode_normalize(t, 'NFD') AS nfd,
        |       length(unicode_normalize(t)) AS n
        |FROM sn_sql""".stripMargin).collect()(0)
    assert(r.getString(0) == composed)
    assert(r.getString(1) == decomposed)
    assert(r.getInt(2) == 4)
    // the form must be a literal — the ordinal is baked into codegen
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(t, t) FROM sn_sql").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("normalization unifies digest keys for exact dedup") {
    // the motivating pipeline: canonically-equivalent text must hash equal
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val digests = df
      .select(md5(StringNormalizeFunctions.unicodeNormalize($"t").cast("binary")))
      .distinct().count()
    assert(digests == 1L)
    val rawDigests = df.select(md5($"t".cast("binary"))).distinct().count()
    assert(rawDigests == 2L)
  }
}
