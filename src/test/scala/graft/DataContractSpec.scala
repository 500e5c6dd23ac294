package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the testdata contract preflight (VERDICT r9 #1): the REAL shipped
  * testdata must come back clean, and each engineered drift — a re-typed
  * column, a missing column, junk props, a mixed-width embedding corpus,
  * an exactly-gap session tie — must produce its NAMED drift entry. The
  * round-8/9 lesson this encodes: the upstream generator has regenerated
  * tables under the engine twice; adaptation without loud detection means
  * the next drift is diagnosed from 100 red queries instead of one line.
  */
class DataContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("the shipped testdata satisfies the contract exactly") {
    val drifts = DataContract.check(spark, "/root/testdata/sf0.001")
    assert(drifts.isEmpty, s"unexpected drift on shipped testdata: $drifts")
  }

  /** A minimal contract-clean table set derived from the real sf0.001
    * data (copied so individual tables can be perturbed per test).
    */
  private def cleanDir(name: String, perturb: Map[String, DataFrame => DataFrame] = Map.empty): String = {
    val dir = s"/tmp/graft_test/contract_$name"
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df0 = spark.read.parquet(s"$src/$t.parquet").limit(200)
      val df = perturb.get(t).map(_(df0)).getOrElse(df0)
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("an unperturbed copy is clean (the harness itself adds no drift)") {
    assert(DataContract.check(spark, cleanDir("baseline")).isEmpty)
  }

  test("a re-typed column produces a named type drift") {
    // The historical breakage, re-enacted: ship events.ts as DOUBLE
    // (a flavor tsMicros does NOT accept) — one named entry, not a
    // hundred red queries.
    val dir = cleanDir("retype",
      Map("events" -> (df => df.withColumn("ts",
        (unix_micros(col("ts").cast("timestamp")) / lit(1000000.0)).as("ts")))))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d => d.table == "events" && d.check == "type:ts"),
      s"expected events/type:ts drift, got: $drifts")
    assert(drifts.size == 1, s"drift must be precise, got: $drifts")
  }

  test("a missing required column produces a named missing drift") {
    val dir = cleanDir("dropcol",
      Map("lineitem" -> (_.drop("l_returnflag"))))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d =>
      d.table == "lineitem" && d.check == "missing:l_returnflag"))
  }

  test("non-JSON props rows are counted and flagged") {
    val dir = cleanDir("junkprops",
      Map("events" -> (df => df.withColumn("props",
        when(col("event_id") % 5 === 0, lit("{not json")).otherwise(col("props"))))))
    val drifts = DataContract.check(spark, dir)
    val hit = drifts.find(d => d.table == "events" && d.check == "props_not_json")
    assert(hit.isDefined, s"expected props_not_json, got: $drifts")
  }

  test("a mixed-width embedding corpus is flagged, not sampled") {
    val dir = cleanDir("mixeddim",
      Map("embeddings" -> (df => df.unionByName(
        Seq((999999L, Array(0.5f, 0.5f), 0)).toDF("vec_id", "embedding", "label")))))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d => d.table == "embeddings" && d.check == "mixed_dim"),
      s"expected mixed_dim, got: $drifts")
  }

  test("a string date column that fails to cast is flagged") {
    val dir = cleanDir("baddate",
      Map("orders" -> (df => df.withColumn("o_orderdate",
        when(col("o_orderkey") % 7 === 0, lit("not-a-date"))
          .otherwise(col("o_orderdate").cast("string"))))))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d =>
      d.table == "orders" && d.check == "uncastable_date:o_orderdate"),
      s"expected uncastable_date drift, got: $drifts")
    // ...while a CLEANLY castable string date column passes
    val ok = cleanDir("strdate",
      Map("orders" -> (df => df.withColumn("o_orderdate",
        date_format(col("o_orderdate"), "yyyy-MM-dd")))))
    assert(DataContract.check(spark, ok).isEmpty)
  }

  test("an exactly-gap consecutive pair is flagged (the sessionize knife-edge)") {
    // Append, for one user, an event EXACTLY SessionGapMicros after that
    // user's newest event — the only input shape on which batch and
    // streaming sessionize legitimately disagree (VERDICT r9 #6).
    val dir = cleanDir("gaptie", Map("events" -> { df =>
      val u = df.select("user_id").limit(1).collect()(0).getLong(0)
      val maxTs = df.where(col("user_id") === u)
        .agg(max(unix_micros(col("ts").cast("timestamp")))).collect()(0).getLong(0)
      df.unionByName(df.sparkSession.range(1).select(
        lit(999999L).as("event_id"),
        timestamp_micros(lit(maxTs + DataContract.SessionGapMicros))
          .cast(df.schema("ts").dataType).as("ts"),
        lit(u).as("user_id"),
        lit("view0").as("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props")))
    }))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d => d.table == "events" && d.check == "exact_gap_tie"),
      s"expected exact_gap_tie, got: $drifts")
  }

  test("a scale-2 half-way tie value is flagged (the decimal cast knife-edge)") {
    // 1.005's binary double is 1.00499999…, but its SHORTEST repr is
    // "1.005" — Spark's decimal cast (HALF_UP on the shortest repr) gives
    // 1.01 while DuckDB (half-even on the binary value) gives 1.00. One
    // such row must produce a named drift; the clean copy has none.
    val dir = cleanDir("dectie", Map("events" -> { df =>
      df.unionByName(df.sparkSession.range(1).select(
        lit(999998L).as("event_id"),
        df.select(col("ts")).limit(1).collect()(0) match { case r =>
          lit(r.get(0)).cast(df.schema("ts").dataType).as("ts") },
        lit(7L).as("user_id"),
        lit("view0").as("event_type"),
        lit(1.005).as("value"),
        lit("{}").as("props")))
    }))
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d => d.table == "events" && d.check == "decimal2_tie:value"),
      s"expected decimal2_tie:value, got: $drifts")
  }

  test("an unreadable table is reported per-table, not as a crash") {
    val dir = cleanDir("missingtable")
    val target = new java.io.File(s"$dir/documents.parquet")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(target)
    val drifts = DataContract.check(spark, dir)
    assert(drifts.exists(d => d.table == "documents" && d.check == "unreadable"))
  }
}
