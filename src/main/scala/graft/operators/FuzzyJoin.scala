package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string-key join (record linkage): all pairs within
  * Levenshtein edit distance `maxDist`, without an all-pairs scan.
  *
  * Blocking is COMPLETE — no pair within the threshold is ever missed:
  * |len(a) − len(b)| ≤ maxDist is a necessary condition for edit
  * distance ≤ maxDist, so rows are bucketed by floor(len / (maxDist+1))
  * and a qualifying pair's buckets differ by at most 1. The probe side
  * replicates to buckets {b−1, b, b+1} (a 3× blowup of ONE side — never
  * a pair product), the build side stays put, and candidate generation
  * is a plain hash equi-join on the bucket key. Each candidate pair
  * surfaces exactly once: the build row lives in a single bucket, so of
  * a pair's two (probe, build) orientations only the one passing the id
  * (or side) ordering is emitted. Survivors pay one THRESHOLD-BOUNDED
  * levenshtein — Spark's codegen'd early-exit DP, returning −1 past the
  * bound instead of filling the full matrix.
  *
  * At 100 TB real length distributions are skewed (documents cluster
  * around common lengths), so the bucket join is left to AQE's skew
  * split; when the caller KNOWS matches share a key (domain, language,
  * first token...), the optional `extraBlock` column sharpens blocking
  * by composing into the join key — completeness then holds only within
  * equal `extraBlock` values, which is exactly the caller's claim.
  */
object FuzzyJoin {

  /** (id, text, block, bucket) with nulls dropped — the shared base of
    * both variants. Bucket arithmetic stays in longs: length is int, the
    * division must floor (ANSI-safe: w ≥ 1).
    */
  private def keyed(df: DataFrame, id: Column, text: Column,
      extraBlock: Option[Column], w: Int): DataFrame =
    df.where(text.isNotNull)
      .select(id.as("id"), text.as("t"),
        extraBlock.getOrElse(lit(0)).as("xb"),
        floor(length(text).cast("long") / w).as("b"))

  private def probeSide(base: DataFrame): DataFrame =
    base.select(col("id"), col("t"), col("xb"),
      explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b"))

  /** Self-join: every pair (id_a < id_b) with lev(text_a, text_b) ≤
    * maxDist. Output (id_a, id_b, dist).
    */
  def selfJoin(df: DataFrame, id: Column, text: Column, maxDist: Int,
      extraBlock: Option[Column] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = keyed(df, id, text, extraBlock, maxDist + 1)
    val probe = probeSide(base).toDF("id_a", "t_a", "xb", "b")
    val build = base.toDF("id_b", "t_b", "xb", "b")
    probe.join(build, Seq("xb", "b"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .where(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }

  /** Two-sided variant: every (left, right) pair within `maxDist`.
    * The LEFT side is the replicated probe — pass the smaller table
    * there when sizes differ. Output (left_id, right_id, dist).
    */
  def join(left: DataFrame, leftId: Column, leftText: Column,
      right: DataFrame, rightId: Column, rightText: Column, maxDist: Int,
      leftBlock: Option[Column] = None, rightBlock: Option[Column] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val probe = probeSide(keyed(left, leftId, leftText, leftBlock, maxDist + 1))
      .toDF("left_id", "t_a", "xb", "b")
    val build = keyed(right, rightId, rightText, rightBlock, maxDist + 1)
      .toDF("right_id", "t_b", "xb", "b")
    probe.join(build, Seq("xb", "b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .where(col("dist") >= 0)
      .select("left_id", "right_id", "dist")
  }
}
