package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.colf._

/** Metadata-only aggregate pushdown and partition-filter absorption.
  *
  * COUNT(*)/COUNT(col)/MIN/MAX — optionally grouped by partition columns,
  * optionally under partition filters — must be answered from file
  * headers with ZERO data-block reads; anything the stats can't prove
  * exactly must fall back to a normal scan and still be correct. The
  * decisive test destroys every data block in place and shows the
  * header-only answers survive while a data read fails.
  */
class ColfMetaAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_meta_agg").toString

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def writePartitioned(dir: String): Unit =
    spark.range(0, 1000)
      .selectExpr("cast(id as int) as k", "cast(id as double) / 8 as x",
        "concat('doc_', lpad(cast(id as string), 4, '0')) as s",
        "cast(id % 4 as int) as p")
      .write.format("colf").option("partitionBy", "p")
      .option("maxRowsPerFile", "100").mode("overwrite").save(dir)

  test("global count/min/max/count(col) answered header-only") {
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    val q = t.agg(count(lit(1)).as("c"), min("k").as("mnk"), max("k").as("mxk"),
      min("s").as("mns"), max("s").as("mxs"), count("x").as("cx"))
    assert(plan(q).contains("PushedAggregates"), plan(q).take(500))
    assert(plan(q).contains("header-only"))
    val r = q.collect().head
    assert(r.getLong(0) == 1000L && r.getInt(1) == 0 && r.getInt(2) == 999)
    assert(r.getString(3) == "doc_0000" && r.getString(4) == "doc_0999")
    assert(r.getLong(5) == 1000L)
  }

  test("partition filter is absorbed and aggregation stays pushed") {
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    val q = t.where($"p" === 2).agg(count(lit(1)).as("c"), min("k").as("mn"), max("k").as("mx"))
    assert(plan(q).contains("PushedAggregates"), plan(q).take(500))
    assert(plan(q).contains("PartitionFilters"))
    val r = q.collect().head
    assert(r.getLong(0) == 250L && r.getInt(1) == 2 && r.getInt(2) == 998)
  }

  test("group-by partition column and SELECT DISTINCT push down") {
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    val g = t.groupBy("p").agg(count(lit(1)).as("c"), max("x").as("mx")).orderBy("p")
    assert(plan(g).contains("PushedAggregates"), plan(g).take(500))
    val rows = g.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(rows.forall(_.getLong(1) == 250L))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(124.5, 124.625, 124.75, 124.875))
    val d = t.select("p").distinct()
    assert(plan(d).contains("PushedAggregates"), plan(d).take(500))
    assert(d.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
  }

  test("aggregates stay correct with every data block destroyed (zero data I/O)") {
    val dir = tmp(); writePartitioned(dir)
    def colfFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) colfFiles(f)
        else if (f.getName.endsWith(".colf")) Seq(f) else Nil)
    colfFiles(new java.io.File(dir)).foreach { f =>
      val raf = new java.io.RandomAccessFile(f, "rw")
      val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      raf.getChannel.read(bb, 6); bb.flip()
      val dataStart = 10L + bb.getInt // preamble + headerSize field + header
      raf.seek(dataStart)
      raf.write(new Array[Byte]((raf.length - dataStart).toInt))
      raf.close()
      // the local FS keeps sidecar checksums; the in-place edit is the test
      val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
      if (crc.exists) crc.delete()
    }
    val t = spark.read.format("colf").load(dir)
    val g = t.groupBy("p").agg(count(lit(1)).as("c"), min("k").as("mn")).orderBy("p")
    assert(plan(g).contains("PushedAggregates"))
    val rows = g.collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((0, 250L, 0), (1, 250L, 1), (2, 250L, 2), (3, 250L, 3)))
    // and the data really is gone: a query that must read blocks fails
    intercept[Exception] { t.agg(sum("k")).collect() }
  }

  test("NaN doubles refuse min/max pushdown but count(col) still pushes") {
    val dir = tmp()
    spark.range(0, 10).selectExpr("cast(id as double) as v", "cast(id % 2 as int) as p")
      .union(spark.sql("select cast('NaN' as double) as v, cast(0 as int) as p"))
      .write.format("colf").option("partitionBy", "p").mode("overwrite").save(dir)
    val t = spark.read.format("colf").load(dir)
    val mm = t.agg(min("v"), max("v"))
    assert(!plan(mm).contains("PushedAggregates"), plan(mm).take(500))
    val r = mm.collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1).isNaN)
    val c = t.agg(count("v"))
    assert(plan(c).contains("PushedAggregates"))
    assert(c.collect().head.getLong(0) == 11L)
  }

  test("-0.0 bounds and truncated string minima refuse pushdown, stay correct") {
    val zdir = tmp()
    Seq(-0.0d, -5.0d).toDF("v").write.format("colf").mode("overwrite").save(zdir)
    val zt = spark.read.format("colf").load(zdir)
    val zq = zt.agg(max("v"))
    // stored max bound is the normalized 0.0 — must NOT be served as -0.0's max
    assert(!plan(zq).contains("PushedAggregates"), plan(zq).take(500))
    assert(zq.collect().head.getDouble(0) == -0.0d)

    val sdir = tmp()
    spark.range(0, 5).selectExpr("repeat('z', 100 + cast(id as int)) as s")
      .write.format("colf").mode("overwrite").save(sdir)
    val st = spark.read.format("colf").load(sdir)
    val sq = st.agg(min("s"))
    assert(!plan(sq).contains("PushedAggregates"), plan(sq).take(500))
    assert(sq.collect().head.getString(0).length == 100)
    // max IS exact for long strings? No — dropped beyond the cap: fallback
    val sq2 = st.agg(max("s"))
    assert(!plan(sq2).contains("PushedAggregates"))
    assert(sq2.collect().head.getString(0).length == 104)
  }

  test("non-partition residual filters block aggregate pushdown, correctly") {
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    val q = t.where($"k" > 500).agg(count(lit(1)))
    assert(!plan(q).contains("PushedAggregates"))
    assert(q.collect().head.getLong(0) == 499L)
  }

  test("absorbed partition filters: exact rows with no Filter node, all shapes") {
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    def hasFilterNode(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.linesIterator
        .exists(_.trim.startsWith("Filter"))
    val eq = t.where($"p" === 3).select("k")
    assert(!hasFilterNode(eq), plan(eq).take(500))
    assert(eq.count() == 250)
    val ne = t.where($"p" =!= 1)
    assert(!hasFilterNode(ne.select("k")))
    assert(ne.count() == 750)
    val rng = t.where($"p" > 1)
    assert(!hasFilterNode(rng.select("k")))
    assert(rng.count() == 500)
    val inq = t.where($"p".isin(0, 2))
    assert(!hasFilterNode(inq.select("k")))
    assert(inq.count() == 500)
    // values survive: absorbed filter must not drop legitimate rows
    assert(t.where($"p" === 2).select(sum("k")).collect().head.getLong(0) ==
      (0L until 1000L).filter(_ % 4 == 2).sum)
  }

  test("layout corrupted after table resolution fails loudly, never silently") {
    // A flat file dropped into a partitioned directory AFTER the table
    // resolved its partition columns defeats exact evaluation of an
    // absorbed filter. The residual re-check is gone, so the only sound
    // behaviors are pruning-by-proof or a loud error — silently emitting
    // (or dropping) the stray file's rows is the one forbidden outcome.
    val dir = tmp(); writePartitioned(dir)
    val t = spark.read.format("colf").load(dir)
    // force the table to verify its partition layout while it is clean,
    // so the later filter IS absorbed (worst case for a layout change)
    assert(t.where($"p" === 3).count() == 250)
    val stray = tmp()
    spark.range(0, 7).selectExpr("cast(id as int) as k", "cast(id as double) as x",
        "cast(id as string) as s")
      .write.format("colf").mode("overwrite").save(stray)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(stray)).toArray
      .map(_.toString).filter(_.endsWith(".colf")).head
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, "stray.colf"))
    val e = intercept[Exception] { t.where($"p" === 2).count() }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else x.toString +: chain(x.getCause)
    assert(chain(e).exists(s => s.contains("undecidable") || s.contains("has no column")),
      chain(e).mkString(" | "))
  }

  test("unpartitioned flat layout: no absorption, pushdown still works globally") {
    val dir = tmp()
    spark.range(0, 100).selectExpr("cast(id as int) as k")
      .write.format("colf").option("maxRowsPerFile", "30").mode("overwrite").save(dir)
    val t = spark.read.format("colf").load(dir)
    val q = t.agg(count(lit(1)), min("k"), max("k"))
    assert(plan(q).contains("PushedAggregates"))
    val r = q.collect().head
    assert(r.getLong(0) == 100L && r.getInt(1) == 0 && r.getInt(2) == 99)
    // a filter on a data column is residual: no absorption possible
    val f = t.where($"k" < 10)
    assert(f.count() == 10)
  }
}
