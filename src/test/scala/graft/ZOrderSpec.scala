package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZFunctions
import graft.operators.ZOrder
import graft.sources.colf.ColfInputPartition

class ZOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def plannedFiles(q: org.apache.spark.sql.DataFrame): Long = {
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    scans.flatMap(_.inputPartitions.collect {
      case p: ColfInputPartition => p.files.size.toLong
    }).sum
  }

  test("z_value: hand-checked buckets and bit interleave") {
    // bits=2 per dim, bounds = interior cuts {10,20,30} / {100,200,300}
    val bounds = Array(Array(10.0, 20.0, 30.0), Array(100.0, 200.0, 300.0))
    val df = Seq(
      (5.0, 50.0),    // buckets (0,0) -> z 0
      (5.0, 150.0),   // buckets (0,1) -> dim1 bit0 at position 1 -> z 2
      (15.0, 50.0),   // buckets (1,0) -> dim0 bit0 at position 0 -> z 1
      (35.0, 350.0),  // buckets (3,3) -> all four low bits -> z 15
      (10.0, 100.0),  // boundary values land RIGHT of their cut: (1,1) -> z 3
    ).toDF("x", "y")
    val z = df.select(ZFunctions.zValue(Seq($"x", $"y"), bounds).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L, 2L, 1L, 15L, 3L))
    // nulls take bucket 0, never fail
    val zn = Seq((null.asInstanceOf[java.lang.Double], 350.0)).toDF("x", "y")
      .select(ZFunctions.zValue(Seq($"x".cast("double"), $"y"), bounds).as("z"))
      .as[Long].head()
    assert(zn == 10L) // buckets (0,3): dim1 bits at positions 1 and 3
  }

  test("z-ordered colf writes prune files on EVERY clustered dimension") {
    val dir = "/tmp/graft_test/zorder_colf"
    // two independent uniform dimensions — a single-column sort can only
    // serve one of them
    val n = 20000
    val data = (0 until n).map { i =>
      (i, (i * 2654435761L % n).toDouble % 1000, ((i * 40503L) % n).toDouble % 1000)
    }.toDF("id", "x", "y")

    // control: cluster on x alone (the pre-z-order best practice)
    data.repartitionByRange(8, $"x").sortWithinPartitions("x")
      .write.format("colf").mode("overwrite").save(s"$dir/by_x")
    // z-ordered on (x, y)
    ZOrder.cluster(data, Seq("x", "y"), bits = 4, numPartitions = 8)
      .write.format("colf").mode("overwrite").save(s"$dir/by_z")

    def probes(path: String): (Long, Long) = {
      val xq = spark.read.format("colf").load(path).where($"x" >= 100 && $"x" < 200)
      val yq = spark.read.format("colf").load(path).where($"y" >= 100 && $"y" < 200)
      assert(xq.count() == data.where($"x" >= 100 && $"x" < 200).count())
      assert(yq.count() == data.where($"y" >= 100 && $"y" < 200).count())
      (plannedFiles(xq), plannedFiles(yq))
    }
    val (xOnlyX, xOnlyY) = probes(s"$dir/by_x")
    val (zX, zY) = probes(s"$dir/by_z")
    // single-column clustering: perfect on x, useless on y
    assert(xOnlyX <= 2, s"x-sort should prune x probes, planned $xOnlyX")
    assert(xOnlyY == 8, s"x-sort cannot prune y probes, planned $xOnlyY")
    // z-order: BOTH dimensions prune (each file covers ~1/8 of the curve,
    // i.e. a bounded rectangle in (x, y))
    assert(zX < 8, s"z-order should prune x probes, planned $zX")
    assert(zY < 8, s"z-order should prune y probes, planned $zY")
    assert(zX + zY < xOnlyX + xOnlyY,
      s"z-order total planned $zX+$zY should beat single-sort $xOnlyX+$xOnlyY")
  }

  test("z-ordered roundtrip preserves content exactly") {
    val df = (0 until 5000).map(i => (i.toLong, (i % 83).toDouble, ((i * 7) % 97).toDouble))
      .toDF("id", "a", "b")
    val back = ZOrder.cluster(df, Seq("a", "b"), bits = 3, numPartitions = 4)
    assert(back.select(sum($"id"), count(lit(1))).as[(Long, Long)].head() ==
      df.select(sum($"id"), count(lit(1))).as[(Long, Long)].head())
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("cluster rejects bad dimension counts and bit widths") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    assertThrows[IllegalArgumentException](ZOrder.cluster(df, Seq("a")))
    assertThrows[IllegalArgumentException](ZOrder.cluster(df, Seq("a", "b"), bits = 32))
  }
}
