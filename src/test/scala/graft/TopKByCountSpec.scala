package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Counted, TopKByCount}

/** The bounded top-(count DESC, label ASC) aggregate that replaced the
  * global rank() window in `topPaths` (round 12): identical output to the
  * window form row-for-row — including NON-ASCII labels, where a naive
  * Java `String <` tie-break (UTF-16 code units) diverges from Spark's
  * UTF8String binary (code-point) sort order — and merge-order invariant,
  * so partial aggregation is sound under any partitioning.
  */
class TopKByCountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // ------------------------------------------------ aggregator unit level

  test("reduce orders by (n desc, label asc) and bounds the buffer at k") {
    val agg = new TopKByCount(3)
    val items = Seq(
      Counted(5, "b"), Counted(9, "z"), Counted(5, "a"),
      Counted(1, "q"), Counted(9, "m"))
    val out = items.foldLeft(agg.zero)(agg.reduce).items
    assert(out == List(Counted(9, "m"), Counted(9, "z"), Counted(5, "a")))
  }

  test("merge of any split equals reduce of the whole (partial-agg soundness)") {
    val rnd = new scala.util.Random(23)
    val agg = new TopKByCount(5)
    // small count range forces tie-breaks through reduce AND merge paths
    val items = Vector.tabulate(300)(i =>
      Counted(rnd.nextInt(6).toLong, s"label-${rnd.nextInt(40)}-$i"))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(0, 1, 97, 299, 300)) {
      val (a, b) = items.splitAt(cut)
      val merged =
        agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == whole, s"split at $cut diverged")
      // merge must commute too (partition order is arbitrary)
      val swapped =
        agg.merge(b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
      assert(swapped == whole, s"swapped merge at $cut diverged")
    }
  }

  test("tie-break is code-point order (= UTF8String binary), not UTF-16 units") {
    // U+1F600 (😀, a supplementary char, UTF-16 = surrogate pair starting
    // 0xD83D) vs U+E000 (private use, single unit): Java String compare
    // puts 😀 FIRST (0xD83D < 0xE000); code-point/UTF-8 order puts U+E000
    // first (0xE000 < 0x1F600). Spark sorts strings by UTF-8 bytes, so
    // only the code-point tie-break matches the window form.
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(emoji < pua, "sanity: UTF-16 unit order would keep the emoji first")
    val agg = new TopKByCount(1)
    val out = Seq(Counted(7, emoji), Counted(7, pua))
      .foldLeft(agg.zero)(agg.reduce).items
    assert(out == List(Counted(7, pua)),
      "code-point order must pick U+E000 over U+1F600 on a count tie")
  }

  // ------------------------------------------- equivalence to the window

  /** The pre-r12 global-window formulation over a counts table. */
  private def windowTopK(counts: DataFrame, k: Int): Seq[(String, Long, Int)] =
    counts
      .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("label"))))
      .where(col("rk") <= k)
      .select("label", "n", "rk")
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)

  private def aggTopK(counts: DataFrame, k: Int): Seq[(String, Long, Int)] = {
    val tk = udaf(new TopKByCount(k), org.apache.spark.sql.Encoders.product[Counted])
    counts.agg(tk(col("n"), col("label")).as("tk"))
      .select(posexplode(col("tk.items")).as(Seq("pos", "s")))
      .select(col("s.label"), col("s.n"), (col("pos") + 1).cast("int"))
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
  }

  test("aggregate equals the rank window row-for-row, incl. non-ASCII ties, any partitioning") {
    val rnd = new scala.util.Random(7)
    val exotic = Seq(new String(Character.toChars(0x1F600)), "\uE000", "é",
      "中文", "zz", "ZZ", "", " lead")
    val labels = (0 until 120).map(i =>
      if (i % 8 == 0) exotic(rnd.nextInt(exotic.length)) + s"-$i"
      else s"path-${rnd.nextInt(30)}-$i") ++ exotic
    val rows = labels.distinct.map(l => (l, rnd.nextInt(5).toLong + 1))
    for (parts <- Seq(1, 7, 32)) {
      val counts = rows.toDF("label", "n").repartition(parts)
      assert(aggTopK(counts, 10) == windowTopK(counts, 10),
        s"diverged from the window form at $parts partitions")
    }
  }

  test("q_top_paths plan has no global window and no global sort") {
    // Asserted on the optimized LOGICAL plan: the physical tree hides
    // under AdaptiveSparkPlanExec (a leaf), and a logical Window with an
    // empty partitionSpec / a global Sort IS what plans the
    // single-partition stage this aggregate exists to remove.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val plan = SparkEntry.queries("q_top_paths")(spark, dir)
      .queryExecution.optimizedPlan
    val globalWindows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, s"single-partition Window survived:\n$plan")
    val globalSorts = plan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
    }
    assert(globalSorts.isEmpty, s"global sort survived:\n$plan")
  }
}
