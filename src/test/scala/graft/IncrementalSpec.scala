package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Incremental view maintenance: the maintained aggregate must equal a
  * from-scratch recompute of the post-change state, bit for bit.
  */
class IncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g").as("grp")).agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(14,2)")).cast("double").as("sum_val"))

  test("maintained aggregate equals full recompute (update, delete, insert, new/emptied groups)") {
    val base = Seq(
      ("a", 1.10), ("a", 2.20), ("b", 5.00), ("c", 7.77)).toDF("g", "v")
    // c emptied; a gets an update (remove old + add new); d is a new group
    val changes = Seq(
      ("removed", "c", 7.77),
      ("removed", "a", 1.10), ("added", "a", 9.90),
      ("added", "d", 4.40), ("added", "d", 0.60)).toDF("ch", "g", "v")
    val finalState = Seq(
      ("a", 9.90), ("a", 2.20), ("b", 5.00), ("d", 4.40), ("d", 0.60)).toDF("g", "v")

    val maintained = Incremental.maintainSumCount(base, changes, col("ch"),
      col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val recomputed = agg(finalState)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(maintained.toSeq == recomputed.toSeq)
    // the emptied group is GONE, not a zero row
    assert(!maintained.exists(_._1 == "c"))
  }

  test("empty change feed leaves the base aggregate unchanged") {
    val base = Seq(("a", 1.25), ("b", 2.50)).toDF("g", "v")
    val changes = Seq.empty[(String, String, Double)].toDF("ch", "g", "v")
    val out = Incremental.maintainSumCount(base, changes, col("ch"), col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq(("a", 1L, 1.25), ("b", 1L, 2.50)))
  }

  test("STREAMING maintenance across microbatches equals the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val feed = mem.toDS().toDF("ch", "g", "v")
    val res = graft.streaming.StreamingOps.maintainSumCountStream(feed,
      col("ch"), col("g"), col("v"))
    val qname = s"stream_ivm_${System.nanoTime()}"
    val q = res.writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    try {
      // batch 1: base as `added` rows; batch 2: update + empty-out + new
      // group — the state must carry the batch-1 sums forward
      mem.addData(("added", "a", 1.10), ("added", "a", 2.20),
        ("added", "b", 5.00), ("added", "c", 7.77))
      q.processAllAvailable()
      mem.addData(("removed", "c", 7.77),
        ("removed", "a", 1.10), ("added", "a", 9.90),
        ("added", "d", 4.40), ("added", "d", 0.60))
      q.processAllAvailable()
      val got = spark.table(qname).where(col("n") > 0)
        .select(col("grp"), col("n"), col("s").cast("double").as("sum_val"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val finalState = Seq(("a", 9.90), ("a", 2.20), ("b", 5.00),
        ("d", 4.40), ("d", 0.60)).toDF("g", "v")
      val recomputed = agg(finalState)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(got.toSeq == recomputed.toSeq)
      assert(!got.exists(_._1 == "c"), "emptied group must drop out under n > 0")
    } finally q.stop()
  }
}
