package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: with `option("preservePartitioning",
  * "true")` the colf scan reports its hive partition layout as a DSv2
  * KeyGroupedPartitioning, and Spark's v2 bucketing plans joins and
  * aggregations ON the partition columns with no Exchange on the colf
  * side — the co-located-join shape that matters most at 100 TB, where
  * shuffling two day-partitioned fact tables to join on the day is
  * pure waste.
  */
class ColfSpjSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("colf_spj_test").toString

  /** Shuffle count in the FINAL (AQE-resolved) physical plan — the
    * naive executedPlan.collect sees only the adaptive wrapper and
    * counts zero everywhere, making no-shuffle assertions vacuous.
    */
  private def shuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes its plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def withSpj[T](f: => T): T = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def writePartitioned(dir: String, rows: Seq[(Int, String, Int)]): Unit =
    rows.toDF("k", "v", "p").write.format("colf")
      .option("partitionBy", "p").mode("overwrite").save(dir)

  test("colf-to-colf join on the partition column plans ZERO shuffles") {
    val a = tmp(); val b = tmp()
    writePartitioned(a, (1 to 40).map(i => (i, s"a$i", i % 4)))
    writePartitioned(b, (1 to 30).map(i => (i, s"b$i", i % 4)))
    withSpj {
      val l = spark.read.format("colf").option("preservePartitioning", "true").load(a)
      val r = spark.read.format("colf").option("preservePartitioning", "true").load(b)
      val j = l.join(r, Seq("p")).groupBy("p")
        .agg(count(lit(1)).as("n"))
      assert(shuffles(j) == 0,
        s"expected a storage-partitioned join, plan:\n${j.queryExecution.executedPlan}")
      // values are right: per-partition row counts = |l_p| * |r_p|
      val got = j.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val want = (0 until 4).map { p =>
        p -> ((1 to 40).count(_ % 4 == p).toLong * (1 to 30).count(_ % 4 == p))
      }.toMap
      assert(got == want)
      // control: WITHOUT the option the same join shuffles
      val l0 = spark.read.format("colf").load(a)
      val r0 = spark.read.format("colf").load(b)
      assert(shuffles(l0.join(r0, Seq("p")).groupBy("p").agg(count(lit(1)))) > 0)
    }
  }

  test("SPJ results survive deletion vectors and uneven partition-value sets") {
    val a = tmp(); val b = tmp()
    // a has partitions 0..3, b only 0..1 — pushPartValues pads the gap
    writePartitioned(a, (1 to 20).map(i => (i, s"a$i", i % 4)))
    writePartitioned(b, (1 to 10).map(i => (i, s"b$i", i % 2)))
    // DVs on one side: delete a few rows merge-on-read
    Seq((1, "seed", 0)).toDF("k", "v", "p") // make "a" versioned first
    spark.sql(s"CREATE TABLE graft_spj_tmp USING colf OPTIONS (path '$a', partitionBy 'p')")
    try {
      spark.conf.set("spark.colf.dml.mode", "merge-on-read")
      // needs a versioned table: enable via maintenance
      graft.sources.colf.ColfMaintenance.enableVersioning(spark, a)
      spark.sql(s"DELETE FROM graft_spj_tmp WHERE k <= 2")
    } finally {
      spark.conf.unset("spark.colf.dml.mode")
      spark.sql("DROP TABLE graft_spj_tmp")
    }
    withSpj {
      val l = spark.read.format("colf").option("preservePartitioning", "true").load(a)
      val r = spark.read.format("colf").option("preservePartitioning", "true").load(b)
      val j = l.join(r, Seq("p")).select(l("k").as("lk"), r("k").as("rk"), col("p"))
      assert(shuffles(j) == 0)
      val got = j.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val want = (for {
        (lk, _, lp) <- (1 to 20).map(i => (i, "", i % 4)) if lk > 2
        (rk, _, rp) <- (1 to 10).map(i => (i, "", i % 2)) if lp == rp
      } yield (lk, rk, lp)).toSet
      assert(got == want)
    }
  }

  test("no SPJ without the option, on flat tables, or when the key is pruned away") {
    val flat = tmp()
    (1 to 10).map(i => (i, s"v$i", i % 2)).toDF("k", "v", "p")
      .write.format("colf").mode("overwrite").save(flat)
    withSpj {
      // flat layout: option accepted, partitioning stays unknown, plans work
      val f = spark.read.format("colf").option("preservePartitioning", "true").load(flat)
      assert(f.groupBy("p").count().collect().map(_.getLong(1)).sum == 10)
      // partitioned but key pruned from the projection: scan must NOT
      // report a partitioning over absent columns
      val part = tmp()
      writePartitioned(part, (1 to 12).map(i => (i, s"v$i", i % 3)))
      val noKey = spark.read.format("colf").option("preservePartitioning", "true")
        .load(part).select("k", "v")
      assert(noKey.collect().length == 12)
    }
  }
}
