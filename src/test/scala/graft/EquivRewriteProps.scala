package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.operators.{Analytics, Graph}

/** The round-11 performance rewrites promise BIT-identical results to the
  * forms they replaced; the sf0.01/sf1 oracle compares pin that on the
  * shipped corpora, this sweep pins it on adversarial random inputs:
  *
  *  - pearson: integer-cent long moments + lossless decimal rebuild must
  *    equal the original decimal-sum formulation double-for-double
  *    (raw IEEE bits), including negative values, constant columns
  *    (exact-zero divisor → guarded NULL, the ANSI-throw case this
  *    sweep originally exposed), nulls, empty groups, and cent sums large
  *    enough that a double-mediated rebuild would round (the 2^53 trap
  *    the decimal(20,0) path exists to avoid is exercised at sf1; here
  *    the span of random magnitudes covers the formula paths).
  *  - pagerank: the sums-only iteration (no per-iteration rank
  *    materialization, no iteration-0 join) must equal the naive
  *    replayed form — per-node rank vector joined every iteration — on
  *    random multigraphs with self-loops, duplicate edges, dangling
  *    nodes, for iters 0..3.
  */
object EquivRewriteProps extends Properties("EquivRewrite") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 8)

  private lazy val spark = SparkTest.session

  // ------------------------------------------------------------- pearson

  private val genXY: Gen[List[(String, Option[Long], Option[Long])]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("g1", "g2", "g3")
      // cents in ±5e7 — values up to ±500k with 2 exact decimals, mixing
      // signs so the moment arithmetic sees cancellation
      x <- Gen.frequency(9 -> Gen.choose(-50000000L, 50000000L).map(Some(_)),
                         1 -> Gen.const(None))
      y <- Gen.frequency(9 -> Gen.choose(-50000000L, 50000000L).map(Some(_)),
                         1 -> Gen.const(None))
    } yield (g, x, y))
  } yield rows

  /** The ORIGINAL (pre-r11) pearson: decimal multiply-sums, one double
    * cast per moment, identical final IEEE expression. */
  private def pearsonDecimal(df: DataFrame): DataFrame = {
    val d = df.select(col("g").as("grp"),
      col("x").cast("decimal(14,2)").as("x"), col("y").cast("decimal(14,2)").as("y"))
    val m = d.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"),
      sum(col("x") * col("y")).cast("double").as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
      sqrt(col("n") * col("syy") - col("sy") * col("sy"))
    // same exact-zero-divisor guard as the rewrite: ANSI Spark throws on
    // 0.0 double division (the sweep's constant-column cases hit it)
    m.select(col("grp"), col("n"),
      when(den =!= lit(0.0), num / den).as("corr"))
  }

  private def bitsOf(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue
        else java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
    }.toMap

  property("pearson cents rewrite == original decimal form, raw double bits") =
    forAllNoShrink(genXY) { rows =>
      import spark.implicits._
      val df = rows.map { case (g, x, y) =>
        (g, x.map(_ / 100.0), y.map(_ / 100.0))
      }.toDF("g", "x", "y").repartition(4)
      val fast = bitsOf(Analytics.pearson(df, col("g"), col("x"), col("y")))
      val ref = bitsOf(pearsonDecimal(df))
      if (fast != ref) {
        println(s"[EquivRewrite] pearson mismatch: fast=$fast ref=$ref rows=${rows.take(8)}")
        false
      } else true
    }

  // ------------------------------------------------------------ pagerank

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 50)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 9L)
      d <- Gen.choose(0L, 9L) // self-loops and duplicates both land
    } yield (s, d))
  } yield rows

  /** The ORIGINAL (pre-r11) pagerank: per-node rank vector materialized
    * and joined every iteration. Same grid-sum, same blend expression. */
  private def pagerankNaive(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src").cache()
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = eDeg
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
      val sums = contrib.groupBy("node")
        .agg((sum(round(col("c") * lit(1.0e12)).cast("decimal(28,0)"))
          .cast("double") / lit(1.0e12)).as("m"))
      pr = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("m"), lit(0.0)))
            .as("pr"))
    }
    pr
  }

  private def prBits(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) ->
      java.lang.Double.doubleToRawLongBits(r.getDouble(1))).toMap

  property("pagerank sums-only iteration == naive per-node form, raw double bits") =
    forAllNoShrink(genEdges, Gen.choose(0, 3)) { (edges, iters) =>
      import spark.implicits._
      val df = edges.toDF("src", "dst").repartition(3)
      val fast = prBits(Graph.pagerank(df, col("src"), col("dst"), iters))
      val ref = prBits(pagerankNaive(df, iters, 0.85))
      if (fast != ref) {
        println(s"[EquivRewrite] pagerank mismatch iters=$iters: " +
          s"fast=$fast ref=$ref edges=${edges.take(12)}")
        false
      } else true
    }
}
