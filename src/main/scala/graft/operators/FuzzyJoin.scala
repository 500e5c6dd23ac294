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

  /** Distinct deletion variants of `t` with at most `k` characters
    * removed: level j is built from level j−1 by deleting one position,
    * deduplicated per level ("aa" minus either char is the same "a").
    * Levels cannot collide across each other for one row (a level-j
    * variant has length len−j), so no final distinct is needed.
    */
  private def deletionVariants(base: DataFrame, k: Int): DataFrame = {
    val del = "transform(sequence(1, length(v)), " +
      "i -> concat(substring(v, 1, i - 1), substring(v, i + 1, length(v))))"
    var level = base.select(col("id"), col("t"), col("xb"), col("t").as("v"))
    var all = level
    for (_ <- 1 to k) {
      level = level
        .where(length(col("v")) > 0)
        .select(col("id"), col("t"), col("xb"), explode(expr(del)).as("v"))
        .distinct()
      all = all.unionByName(level)
    }
    all
  }

  /** Self-join via deletion-neighborhood (FastSS-style) blocking — the
    * COMPLETE alternative to [[selfJoin]]'s length bands for the corpus
    * shape that defeats them: short KEYS of one clustered length
    * (`customer.c_name` is uniformly 18 chars, so every row lands in one
    * length bucket and the band join degenerates to all-pairs).
    *
    * Completeness (pigeonhole on the alignment): if lev(a,b) = d ≤ k,
    * an optimal alignment has s substitutions, i insertions and dd
    * deletions with s+i+dd = d; deleting a's substituted + a-only
    * characters (s+dd ≤ k) and b's substituted + b-only characters
    * (s+i ≤ k) leaves the SAME string, so a and b share a variant in
    * their ≤k-deletion neighborhoods and the equi-join on the variant
    * string finds the pair. False candidates (e.g. "ab"/"ba" share both
    * "a" and "b" at k=1 but sit at distance 2) die at the bounded
    * levenshtein; multi-variant collisions are deduplicated BEFORE the
    * DP so each pair pays it once.
    *
    * Scale shape: each row fans out to Σ_{j≤k} C(len, j) variant rows —
    * ×(len+1) at k=1 — then ONE hash equi-join on the variant string
    * whose bucket sizes are neighborhood co-members, not length-class
    * sizes. Candidates ≈ true matches + bounded collision noise, so the
    * join cost tracks OUTPUT size where the band join tracks the square
    * of the largest length class. The fan-out is the price: intended for
    * short join KEYS (names, codes, titles), hence the k ≤ 2 bound —
    * past that the C(len, k) blowup outgrows the win. Same output
    * contract as [[selfJoin]] (id_a < id_b, bounded dist), equality
    * pinned on random corpora by FuzzyJoinProps.
    */
  def selfJoinDeletions(df: DataFrame, id: Column, text: Column, maxDist: Int,
      extraBlock: Option[Column] = None): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"deletion blocking fans out C(len, k) variants per row; k must be in [0, 2], got $maxDist")
    val base = df.where(text.isNotNull)
      .select(id.as("id"), text.as("t"), extraBlock.getOrElse(lit(0)).as("xb"))
    val vars = deletionVariants(base, maxDist)
    val a = vars.toDF("id_a", "t_a", "xb", "v")
    val b = vars.toDF("id_b", "t_b", "xb", "v")
    a.join(b, Seq("xb", "v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "t_a", "id_b", "t_b").distinct()
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .where(col("dist") >= 0)
      .select("id_a", "id_b", "dist")
  }

  /** Corpus-derived blocking decision for [[selfJoinAuto]] — the same
    * measure-then-plan pattern as `Similarity.AutoPlanes`/`AutoDim`: one
    * column-pruned aggregate over `length(text)` (reads one int per row)
    * decides, instead of a remembered constant about the corpus shape.
    *
    * Deletion blocking wins when the band join's dominant cost term —
    * the square of the largest length-band population — outgrows the
    * deletion fan-out's linear cost. Decision rule, deliberately simple
    * and stated so it can be audited: pick deletions iff the largest
    * band holds a CONSTANT fraction of the corpus (> 1/2 here: the band
    * join is then Θ(n²) in that band alone) AND keys are short enough
    * for the C(len, k) fan-out to be the cheap side (maxLen ≤ 64) AND
    * k ≤ 2 (the deletion path's supported range). Everything else keeps
    * the band join, whose worst case is exactly the concentration this
    * rule detects.
    */
  private[graft] def preferDeletionBlocking(df: DataFrame, text: Column,
      maxDist: Int): Boolean = {
    if (maxDist > 2) false
    else {
      val w = maxDist + 1
      val row = df.where(text.isNotNull)
        .select(floor(length(text).cast("long") / w).as("b"), length(text).as("len"))
        .groupBy("b").agg(count(lit(1)).as("n"), max("len").as("ml"))
        .agg(coalesce(sum("n"), lit(0L)).as("total"),
          coalesce(max("n"), lit(0L)).as("maxBand"),
          coalesce(max("ml"), lit(0)).as("maxLen"))
        .head()
      val (total, maxBand, maxLen) = (row.getLong(0), row.getLong(1), row.getInt(2))
      total > 0 && maxLen <= 64 && maxBand * 2 > total
    }
  }

  /** Self-join with the blocking strategy CHOSEN FROM THE CORPUS
    * ([[preferDeletionBlocking]]): length bands for spread length
    * distributions, deletion neighborhoods when one length class
    * dominates (the shape that degenerates bands to a quadratic bucket —
    * the shipped customer names are ALL 18 chars). Both strategies have
    * the identical output contract, so the choice is invisible in
    * results and only the plan/cost changes; the one extra pass is a
    * one-int-per-row aggregate at plan time.
    */
  def selfJoinAuto(df: DataFrame, id: Column, text: Column, maxDist: Int,
      extraBlock: Option[Column] = None): DataFrame =
    if (preferDeletionBlocking(df, text, maxDist))
      selfJoinDeletions(df, id, text, maxDist, extraBlock)
    else selfJoin(df, id, text, maxDist, extraBlock)

  /** Two-sided deletion-blocked variant of [[selfJoinDeletions]]: every
    * (left, right) pair within `maxDist`, via the same ≤k-deletion
    * neighborhood equi-join (see [[selfJoinDeletions]] for the
    * completeness argument — it is side-agnostic). Unlike the length-band
    * [[join]] there is no replicated "probe" side to choose: both sides
    * fan out ×Σ C(len, j) and meet on the variant string, so argument
    * order does not matter. Output (left_id, right_id, dist), each pair
    * once.
    */
  def joinDeletions(left: DataFrame, leftId: Column, leftText: Column,
      right: DataFrame, rightId: Column, rightText: Column, maxDist: Int,
      leftBlock: Option[Column] = None, rightBlock: Option[Column] = None): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"deletion blocking fans out C(len, k) variants per row; k must be in [0, 2], got $maxDist")
    val l = deletionVariants(left.where(leftText.isNotNull)
        .select(leftId.as("id"), leftText.as("t"),
          leftBlock.getOrElse(lit(0)).as("xb")), maxDist)
      .toDF("left_id", "t_a", "xb", "v")
    val r = deletionVariants(right.where(rightText.isNotNull)
        .select(rightId.as("id"), rightText.as("t"),
          rightBlock.getOrElse(lit(0)).as("xb")), maxDist)
      .toDF("right_id", "t_b", "xb", "v")
    l.join(r, Seq("xb", "v"))
      .select("left_id", "t_a", "right_id", "t_b").distinct()
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .where(col("dist") >= 0)
      .select("left_id", "right_id", "dist")
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
