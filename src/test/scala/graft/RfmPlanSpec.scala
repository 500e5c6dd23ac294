package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Sort, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** The scale guarantee the r12 q_rfm rewrite exists for: quintile ranks
  * come from `Packing.globalRowNumber` (range exchange + per-range
  * offsets), NOT a `row_number()` window with no partitionBy — which
  * plans a SINGLE-partition sort of the whole per-user table and cannot
  * scale past one executor. Plan-asserted here (the comment in
  * SparkEntry's q_rfm cites this spec), plus value-identity of the rank
  * and of the derived quintile scores against the window form on a
  * tie-heavy fixture.
  */
class RfmPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("q_rfm plan has no single-partition Window and no global Sort") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    // Optimized logical plan: the physical tree hides under
    // AdaptiveSparkPlanExec (a leaf node), and an empty-partitionSpec
    // Window / global Sort here is exactly what would plan the
    // single-partition stage.
    val plan = SparkEntry.queries("q_rfm")(spark, dir).queryExecution.optimizedPlan
    val globalWindows = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(globalWindows.isEmpty, s"single-partition Window survived:\n$plan")
    val globalSorts = plan.collect { case s: Sort if s.global => s }
    assert(globalSorts.isEmpty, s"global sort survived:\n$plan")
  }

  test("globalRowNumber equals the global row_number window, ties included") {
    // tie-heavy: only 5 distinct keys over 400 rows, so the struct
    // tie-break (key, id) carries the total order
    val df = (1 to 400).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "key")
    val win = df.withColumn("rk",
        row_number().over(Window.orderBy(struct($"key", $"id"))).cast("long"))
      .select("id", "rk").as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = Packing.globalRowNumber(df.repartition(parts),
          struct($"key", $"id"), "rk", numPartitions = 7)
        .select("id", "rk").as[(Long, Long)].collect().toMap
      assert(got == win, s"diverged from the window form at $parts input partitions")
    }
  }

  test("quintile scores from globalRowNumber match the window form on ties") {
    // the exact q_rfm score arithmetic: 1 + floor((rk-1) * 5 / n)
    val n = 123
    val df = (1 to n).map(i => (i.toLong, (i % 4).toLong)).toDF("user_id", "frequency")
      .crossJoin(broadcast(Seq(n.toLong).toDF("n_users")))
    def quintile(rk: org.apache.spark.sql.Column) =
      (lit(1) + floor((rk.cast("double") - 1.0) * 5.0 / col("n_users"))).cast("int")
    val win = df.withColumn("rk",
        row_number().over(Window.orderBy(struct($"frequency", $"user_id"))))
      .withColumn("s", quintile($"rk"))
      .select("user_id", "s").as[(Long, Int)].collect().toMap
    val dist = Packing.globalRowNumber(df, struct($"frequency", $"user_id"), "rk")
      .withColumn("s", quintile($"rk"))
      .select("user_id", "s").as[(Long, Int)].collect().toMap
    assert(dist == win)
    // every quintile is populated on a table this size
    assert(dist.values.toSet == Set(1, 2, 3, 4, 5))
  }
}
