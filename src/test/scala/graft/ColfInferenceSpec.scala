package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf.{ColfInference, ColfType}

/** COLF schema-inference semantics matrix (SURVEY.md §1.4, verified against
  * the reference by execution in round 0).
  */
class ColfInferenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private def infer(csv: String): Seq[(String, ColfType, Boolean)] = {
    val f = Files.createTempFile("colf_inf", ".csv")
    Files.writeString(f, csv)
    val raw = spark.read.option("header", "true").csv(f.toString)
    ColfInference.inferFields(raw).map(f => (f.name, f.tpe, f.nullable))
  }

  test("int32 ≺ float64 ≺ utf8 precedence") {
    assert(infer("a,b,c\n1,1.5,x\n-2,2e3,y\n+3,nan,1z\n") == Seq(
      ("a", ColfType.Int32, false),
      ("b", ColfType.Float64, false),
      ("c", ColfType.Utf8, false)))
  }

  test("blank/whitespace cell makes a column nullable, for every type") {
    assert(infer("i,s\n1,x\n  ,  \n2,y\n") == Seq(
      ("i", ColfType.Int32, true),
      ("s", ColfType.Utf8, true)))
  }

  test("all-blank column infers int32 (reference vacuous-truth rule)") {
    assert(infer("e,s\n ,x\n,y\n") == Seq(
      ("e", ColfType.Int32, true),
      ("s", ColfType.Utf8, false)))
  }

  test("scientific notation, inf, and signed floats infer float64") {
    assert(infer("f\n1e3\n-INF\n+.5\ninfinity\nNaN\n")(0)._2 == ColfType.Float64)
  }

  test("mixed int-then-decimal widens to float64, not utf8") {
    assert(infer("m\n1\n2.5\n")(0)._2 == ColfType.Float64)
  }

  test("applySchema: blanks become null, strings keep trailing spaces, numerics trimmed") {
    val f = Files.createTempFile("colf_apply", ".csv")
    // quoted to preserve whitespace through the CSV reader
    Files.writeString(f, "i,s\n\" 7 \",\"x \"\n\"  \",\"  \"\n")
    val raw = spark.read.option("header", "true").csv(f.toString)
    val typed = ColfInference.applySchema(raw, ColfInference.inferFields(raw))
    val rows = typed.collect()
    assert(typed.schema.map(_.dataType.simpleString) == Seq("int", "string"))
    assert(rows(0).getInt(0) == 7 && rows(0).getString(1) == "x ")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("int32 overflow fails the write path with a clear error") {
    val f = Files.createTempFile("colf_ovf", ".csv")
    Files.writeString(f, "i\n9999999999\n")
    val raw = spark.read.option("header", "true").csv(f.toString)
    val fields = ColfInference.inferFields(raw)
    assert(fields(0).tpe == ColfType.Int32)
    val e = intercept[IllegalArgumentException] {
      ColfInference.applySchema(raw, fields).collect()
    }
    assert(e.getMessage.contains("int32 overflow"))
  }

  test("tab/newline-only cells are NULL like Python strip(), not utf8 values") {
    val f = Files.createTempFile("colf_tab", ".csv")
    Files.writeString(f, "i,s\n\"\t\",x\n\" 7\t\",y\n")
    val raw = spark.read.option("header", "true").csv(f.toString)
    val fields = ColfInference.inferFields(raw)
    // tab-only cell is blank ⇒ column stays int32 + nullable; " 7\t" parses as 7
    assert(fields(0) == graft.sources.colf.ColfField("i", ColfType.Int32, true))
    val rows = ColfInference.applySchema(raw, fields).orderBy("s").collect()
    assert(rows(0).isNullAt(0) && rows(1).getInt(0) == 7)
  }

  test("beyond-Int64 integers fail loudly, never silently null") {
    val f = Files.createTempFile("colf_huge", ".csv")
    Files.writeString(f, "i\n92233720368547758080\n")   // > Long.MaxValue
    val raw = spark.read.option("header", "true").csv(f.toString)
    val fields = ColfInference.inferFields(raw)
    assert(fields(0).tpe == ColfType.Int32)
    val e = intercept[IllegalArgumentException] {
      ColfInference.applySchema(raw, fields).collect()
    }
    assert(e.getMessage.contains("int32 overflow"))
  }

  test("applySchema parses nan/inf spellings into real double values") {
    val f = Files.createTempFile("colf_inf", ".csv")
    Files.writeString(f, "d\nnan\n-INF\ninfinity\n1e3\n")
    val raw = spark.read.option("header", "true").csv(f.toString)
    val vals = ColfInference.applySchema(raw, ColfInference.inferFields(raw))
      .collect().map(_.getDouble(0))
    assert(vals(0).isNaN)
    assert(vals(1) == Double.NegativeInfinity)
    assert(vals(2) == Double.PositiveInfinity)
    assert(vals(3) == 1000.0)
  }

  test("readCsv end-to-end parity entry point") {
    val f = Files.createTempFile("colf_e2e", ".csv")
    Files.writeString(f, "id,price,name\n1,9.99,ab\n2,,\n")
    val df = ColfInference.readCsv(spark, f.toString)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getDouble(1) == 9.99 && rows(0).getString(2) == "ab")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }
}
