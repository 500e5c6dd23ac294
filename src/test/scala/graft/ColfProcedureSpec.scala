package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL stored procedures (`CALL colf.<proc>(...)` via the DSv2
  * ProcedureCatalog): table maintenance from pure SQL, one-row results
  * carrying the same counts the Scala API returns.
  */
class ColfProcedureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkTest.session
    s.conf.set("spark.sql.catalog.colf_proc",
      classOf[graft.sources.colf.ColfCatalog].getName)
    s
  }
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_proc_test").toString

  test("CALL compact / vacuum_versions / enable_versioning round-trip a partitioned table") {
    val dir = tmp()
    for (i <- 0 until 4)
      Seq((i, "a", 0), (i + 10, "b", 1)).toDF("k", "s", "p")
        .write.format("colf").option("partitionBy", "p").mode("append").save(dir)

    val v = spark.sql(s"CALL colf_proc.enable_versioning('$dir')")
      .collect().map(_.getLong(0)).toSeq
    assert(v == Seq(1L))

    val c = spark.sql(s"CALL colf_proc.compact('$dir')")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(c == Seq((8, 2)), s"expected 8 -> 2 files, got $c")
    assert(spark.read.format("colf").load(dir).count() == 8)
    assert(spark.read.format("colf").option("versionAsOf", 1).load(dir).count() == 8)

    // named arguments + analyzer-applied defaults; sort_by re-clusters
    val c2 = spark.sql(
      s"CALL colf_proc.compact('$dir', sort_by => 'k', target_mb => 64)")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(c2.head._1 == 2)

    val vv = spark.sql(
      s"CALL colf_proc.vacuum_versions('$dir', retain_last => 1, grace_minutes => 0)")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(vv.head._2 >= 1, s"expected pruned versions, got $vv")
    assert(spark.read.format("colf").load(dir).count() == 8)

    val vac = spark.sql(s"CALL colf_proc.vacuum('$dir', grace_minutes => 0)")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(vac == Seq((0, 0))) // healthy table: no orphaned temps
  }

  test("SHOW PROCEDURES lists all five; DESCRIBE PROCEDURE explains one") {
    val names = spark.sql("SHOW PROCEDURES IN colf_proc")
      .collect().map(_.getString(3)).toSet
    assert(names == Set("compact", "vacuum", "vacuum_versions", "enable_versioning",
      "rewrite_manifests"))
    val desc = spark.sql("DESCRIBE PROCEDURE colf_proc.compact")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("compact") && desc.contains("partition"))
  }

  test("unknown procedure and bad namespace fail loudly") {
    val e = intercept[Exception] {
      spark.sql("CALL colf_proc.nope('/tmp/x')").collect()
    }
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[Exception] {
      spark.sql("CALL colf_proc.a.b.compact('/tmp/x')").collect()
    }
    assert(e2 != null)
  }
}
