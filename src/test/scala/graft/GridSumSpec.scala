package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GridSum, TextAnalysis}

/** Pins the two-level grid sum's partial/final split (VERDICT r18 #3):
  * long 31-bit limb partials per Spark partition, decimal combine across
  * partitions. The contract under test is BIT-IDENTITY with the one-level
  * decimal(28,0) sum it replaced — including totals a single long cannot
  * hold — and partitioning invariance (the partial boundaries are
  * placement accidents; the combined integer must not be).
  */
class GridSumSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  test("limb identity: hi*2^31 + lo == v across signs and extremes") {
    val vs = Seq(0L, 1L, -1L, (1L << 31) - 1, 1L << 31, (1L << 31) + 1,
      -(1L << 31), -(1L << 31) - 1, 1234567890123L, -1234567890123L,
      Long.MaxValue, Long.MinValue + 1, Long.MinValue)
    val got = vs.toDF("v")
      .select(col("v"),
        (GridSum.hi(col("v")) * lit(GridSum.LimbBase) + GridSum.lo(col("v")))
          .as("recombined"),
        GridSum.lo(col("v")).as("lo"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(0), s"recombine broke for ${r.getLong(0)}")
      assert(r.getLong(2) >= 0 && r.getLong(2) < GridSum.LimbBase,
        s"lo out of [0, 2^31) for ${r.getLong(0)}")
    }
  }

  test("two-level sum equals the one-level decimal sum past Long range") {
    // 5 × 8e18 = 4e19 > Long.MaxValue: a plain long sum would overflow
    // (the reason q_kmeans/q_lm_score kept decimal buffers); the
    // two-level form must reproduce the decimal sum's exact integer.
    val vs = Seq(8000000000000000000L, 8000000000000000000L,
      8000000000000000000L, 8000000000000000000L, 8000000000000000000L,
      -3L, 7L)
    val df = vs.toDF("v").repartition(3)
    val oneLevel = df.agg(sum(col("v").cast("decimal(28,0)"))).first().getDecimal(0)
    val twoLevel = df
      .select(col("v"), spark_partition_id().as("_pid"))
      .groupBy("_pid")
      .agg(sum(GridSum.hi(col("v"))).as("_hi"), sum(GridSum.lo(col("v"))).as("_lo"))
      .agg(GridSum.combine(col("_hi"), col("_lo")))
      .first().getDecimal(0)
    assert(twoLevel.compareTo(oneLevel) == 0,
      s"two-level $twoLevel != one-level $oneLevel")
  }

  test("single-level limb sums equal the decimal sum past Long range (combineLongSums)") {
    // The form q_kmeans/q_lm_score ship: whole-group LONG limb sums,
    // one decimal recombine per group — same stage count as the decimal
    // sum it replaced, exact for totals a plain long sum cannot hold.
    val vs = Seq(8000000000000000000L, 8000000000000000000L,
      8000000000000000000L, 8000000000000000000L, 8000000000000000000L,
      -3L, 7L, -8000000000000000000L)
    val df = vs.toDF("v").repartition(3)
    val oneLevel = df.agg(sum(col("v").cast("decimal(28,0)"))).first().getDecimal(0)
    val got = df
      .agg(sum(GridSum.hi(col("v"))).as("_hi"), sum(GridSum.lo(col("v"))).as("_lo"))
      .select(GridSum.combineLongSums(col("_hi"), col("_lo")))
      .first().getDecimal(0)
    assert(got.compareTo(oneLevel) == 0, s"single-level $got != decimal $oneLevel")
  }

  test("two-level sum is partitioning-invariant (grouped, mixed signs)") {
    val rows = (1 to 997).map(i => ("g" + (i % 3), (i.toLong * 2654435761L) *
      (if (i % 2 == 0) 1L else -1L)))
    def sums(parts: Int): Map[String, java.math.BigDecimal] = rows.toDF("g", "v")
      .repartition(parts)
      .select(col("g"), col("v"), spark_partition_id().as("_pid"))
      .groupBy("g", "_pid")
      .agg(sum(GridSum.hi(col("v"))).as("_hi"), sum(GridSum.lo(col("v"))).as("_lo"))
      .groupBy("g")
      .agg(GridSum.combine(col("_hi"), col("_lo")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val a = sums(1); val b = sums(5); val c = sums(32)
    assert(a.keySet == b.keySet && b.keySet == c.keySet)
    a.keySet.foreach { k =>
      assert(a(k).compareTo(b(k)) == 0 && b(k).compareTo(c(k)) == 0,
        s"group $k drifted across partitionings: ${a(k)} / ${b(k)} / ${c(k)}")
    }
  }

  test("lmScore's two-level xent_bits matches a direct decimal replay and is partition-invariant") {
    val docs = Seq(
      (1L, "alpha beta beta gamma gamma gamma"),
      (2L, "alpha alpha delta"),
      (3L, "beta gamma delta delta alpha beta")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // direct one-level decimal replay of the same definition
    // same tokenizer as TextAnalysis.tokens (split on single space)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n_total"))
    val surp = counts.crossJoin(broadcast(total))
      .select(col("token"),
        round((log2(col("n_total")) - log2(col("c"))) * lit(1.0e12))
          .cast("decimal(28,0)").as("nb"))
    val want = toks.join(surp, "token").groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("nb").as("snb"))
      .select(col("doc_id"), col("n"),
        ((col("snb").cast("double") / lit(1.0e12)) / col("n")).as("x"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2, g._4)).toSeq == want.toSeq)
    // partitioning invariance of the full operator (bit-level doubles)
    val again = TextAnalysis.lmScore(docs.repartition(7), col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == again.toSeq)
  }
}
