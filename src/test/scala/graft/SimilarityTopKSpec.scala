package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Scored, TopKBuf, TopKByScore}
import graft.operators.Similarity

/** The bounded two-stage top-k (TopKByScore) that replaced the
  * `row_number()` window in all three similarity strategies (VERDICT r2
  * #2): identical results tie-for-tie, and a physical plan with no window
  * and no sort of the scored set.
  */
class SimilarityTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // ------------------------------------------------ aggregator unit level

  test("TopKByScore orders by (cos desc, id asc) and bounds the buffer") {
    val agg = new TopKByScore(3)
    val items = Seq(
      Scored(0.5, 9), Scored(0.9, 4), Scored(0.5, 2), Scored(0.1, 1), Scored(0.9, 7))
    val out = items.foldLeft(agg.zero)(agg.reduce).items
    assert(out == List(Scored(0.9, 4), Scored(0.9, 7), Scored(0.5, 2)))
  }

  test("merge of any split equals reduce of the whole (partial-agg soundness)") {
    val rnd = new scala.util.Random(11)
    val agg = new TopKByScore(5)
    // duplicated scores force tie-breaks through the merge path too
    val items = Vector.fill(200)(Scored(rnd.nextInt(20) / 10.0, rnd.nextInt(50).toLong))
      .zipWithIndex.map { case (s, i) => s.copy(id = s.id * 1000 + i) } // unique ids
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(0, 1, 67, 199, 200)) {
      val (a, b) = items.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == whole, s"split at $cut diverged")
    }
    // NaN sorts largest, exactly like a descending Spark sort
    val withNaN = agg.reduce(whole, Scored(Double.NaN, 1L))
    assert(withNaN.items.head.cos.isNaN)
  }

  // ------------------------------------------- equivalence to the window

  /** The pre-r3 window formulation, over the same scoring expressions. */
  private def windowTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id").as("nbr_id"), Similarity.asDouble(col("vec")).as("nbr_vec"))
      .withColumn("nbr_nrm", Similarity.norm(col("nbr_vec")))
    val q = queries.select(col("id").as("query_id"), Similarity.asDouble(col("vec")).as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        Similarity.dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "nbr_id", "rank", "cos")
  }

  private def rows(df: DataFrame) = df.collect().map { r =>
    (r.getLong(0), r.getLong(1), r.getInt(2),
      java.lang.Double.doubleToLongBits(r.getDouble(3)))
  }.toSet

  test("bruteForceTopK equals the window form tie-for-tie (bit-identical cos)") {
    val rnd = new scala.util.Random(5)
    val base = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    // exact duplicate vectors ⇒ exact cosine ties ⇒ the id tie-break decides
    val vecs = base ++ (60L until 80L).map(i => (i, base((i % 20).toInt)._2))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 6)
    val fast = rows(Similarity.bruteForceTopK(df, q, k = 7))
    val ref = rows(windowTopK(df, q, k = 7))
    assert(fast == ref)
    assert(fast.nonEmpty)
  }

  test("zero-norm vectors: no ANSI divide-by-zero, excluded from results, others bit-unchanged") {
    // ANSI Spark throws on an exact-0.0 double divisor (the pearson class;
    // pinned by AnalyticsSpec's "engine pin" test), and all-zero embeddings
    // are a real pipeline artifact (failed encoders). cosineFromNorms
    // yields NULL there; consumers filter it.
    import graft.operators.Dedup
    val vecs = Seq(
      (1L, Array(0f, 0f, 0f, 0f)),          // the zero vector
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0f, 0f, 0f, 0f))           // a second zero vector
    ).toDF("id", "vec")
    val bf = Similarity.bruteForceTopK(vecs, vecs, k = 3).collect()
    assert(!bf.map(_.getLong(0)).contains(1L) && !bf.map(_.getLong(1)).contains(1L),
      "zero vector must appear neither as query nor neighbor")
    assert(bf.nonEmpty)
    // dedup: exact path and the planes=0 LSH degenerate form still agree,
    // zero vectors absent (even the identical zero PAIR has no cosine)
    val emb = vecs.toDF("vec_id", "embedding")
    val exact = Dedup.cosineNearDups(emb, col("vec_id"), col("embedding"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((2L, 3L)), s"got $exact")
    val lsh = Dedup.cosineNearDupsLSH(emb, col("vec_id"), col("embedding"), 0.5,
      bands = 1, planesPerBand = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    // IVF and PQ paths survive a zero query/corpus vector too
    val ivf = Similarity.ivfTopK(vecs, vecs, k = 2)
    assert(ivf.collect().nonEmpty)
    val pq = Similarity.pqTopK(vecs, vecs, k = 2, m = 4, bits = 2)
    assert(pq.collect().map(_.getLong(0)).distinct.forall(_ != 1L))
  }

  test("top-k plan: partial aggregation, no window, no sort of the scored set") {
    val df = (0L until 40L).map(i => (i, Array.fill(4)((i % 7).toFloat + 1f))).toDF("id", "vec")
    val r = Similarity.bruteForceTopK(df, df.where($"id" < 3), k = 5)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg in:\n$plan")
    assert(plan.contains("partial_topkbyscore") || plan.toLowerCase.contains("partial"),
      s"expected a partial aggregation stage in:\n$plan")
    assert(!plan.contains("Window"), s"window survived in:\n$plan")
    assert(!plan.contains("Sort "), s"a sort survived in:\n$plan")
  }
}
