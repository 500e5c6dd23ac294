package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB claim behind q_bucketed_join: writing both fact tables
  * bucketed (and bucket-sorted) on the join key makes every later join on
  * that key exchange-free AND sort-free — the dominant cost of a fact-fact
  * join paid once at write time. These specs pin the plan shape, not just
  * the result.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    expanded +: expanded.children.flatMap(collectAll)
  }

  test("bucketed sort-merge join runs with no exchange and no sort") {
    val dir = "/tmp/graft_test/bucketed_join"
    spark.sql("DROP TABLE IF EXISTS spec_li_b")
    spark.sql("DROP TABLE IF EXISTS spec_ord_b")
    val li = (1L to 4000L).map(k => ((k - 1) % 800 + 1, k)).toDF("k", "v")
    val ord = (1L to 800L).map(k => (k, s"p${k % 5}")).toDF("k", "p")
    // repartition(n, key) hash-places each bucket's rows on exactly one
    // task (same murmur3-pmod as the bucket id), so every bucket is ONE
    // file — the layout Spark requires before it trusts the written sort
    // order and elides the per-side SortExec.
    li.repartition(4, col("k")).write.mode("overwrite").option("path", s"$dir/li")
      .bucketBy(4, "k").sortBy("k").saveAsTable("spec_li_b")
    ord.repartition(4, col("k")).write.mode("overwrite").option("path", s"$dir/ord")
      .bucketBy(4, "k").sortBy("k").saveAsTable("spec_ord_b")

    val joined = spark.table("spec_li_b").hint("merge")
      .join(spark.table("spec_ord_b").withColumnRenamed("k", "k2"),
        col("k") === col("k2"))
    assert(joined.count() == 4000)

    val nodes = collectAll(joined.queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected a sort-merge join")
    // Neither side of the join may shuffle: the bucket layout satisfies
    // the join's distribution requirement outright. (The shuffle is the
    // 100-TB cost; Spark ≥3.0 still inserts a defensive per-partition
    // sort of the already-sorted runs unless the legacy sorted-scan flag
    // below is on.)
    val underJoin = smj.flatMap(j => j.children.flatMap(collectAll))
    assert(!underJoin.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan}")

    // With sorted-bucket scans enabled, the written sortBy order is
    // trusted (possible only because each bucket is one file) and the
    // per-side SortExec disappears too.
    val flag = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(flag, "true")
    try {
      val sorted = spark.table("spec_li_b").hint("merge")
        .join(spark.table("spec_ord_b").withColumnRenamed("k", "k2"),
          col("k") === col("k2"))
      assert(sorted.count() == 4000)
      val under = collectAll(sorted.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
        .flatMap(j => j.children.flatMap(collectAll))
      assert(!under.exists(_.isInstanceOf[ShuffleExchangeLike]))
      assert(!under.exists(_.isInstanceOf[SortExec]),
        s"sorted bucket scan must elide the join sorts:\n${sorted.queryExecution.executedPlan}")
    } finally spark.conf.set(flag, "false")
  }

  test("bucketed join result equals the plain shuffle join") {
    val plain = (1L to 4000L).map(k => ((k - 1) % 800 + 1, k)).toDF("k", "v")
      .join((1L to 800L).map(k => (k, s"p${k % 5}")).toDF("k2", "p"), col("k") === col("k2"))
      .groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("p").collect().toSeq
    val bucketed = spark.table("spec_li_b").hint("merge")
      .join(spark.table("spec_ord_b").withColumnRenamed("k", "k2"), col("k") === col("k2"))
      .groupBy("p").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("p").collect().toSeq
    assert(bucketed == plain)
  }
}
