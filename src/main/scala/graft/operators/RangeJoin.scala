package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every left "point" row with the
  * right "interval" rows whose `[lo, hi]` contains its value (optionally
  * also matching equi-keys) — prices to bands, timestamps to validity
  * windows, offsets to shard ranges.
  *
  * Spark executes the naive `p.v BETWEEN i.lo AND i.hi` as a
  * broadcast-nested-loop join — O(|P|·|I|) comparisons, a non-starter at
  * scale. This implementation BUCKETIZES the value domain instead:
  *
  *  1. each interval replicates to every width-`bucketWidth` bucket it
  *     overlaps (`explode(sequence(floor(lo/w), floor(hi/w)))`);
  *  2. each point maps to the single bucket containing its value;
  *  3. a plain hash equi-join on (keys..., bucket) meets them, and the
  *     exact `lo ≤ v ≤ hi` predicate filters bucket-level false
  *     positives.
  *
  * A point lives in exactly one bucket, so a matching interval is met
  * exactly once — no dedup pass. Cost: the interval side shuffles
  * ×(avgSpan/w + 1) replicas; pick `bucketWidth` near the typical
  * interval length so replication stays O(1) per interval while each
  * bucket's candidate set stays small. Intervals with `hi < lo` are
  * dropped (never matchable; also keeps `sequence` ascending).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / lit(bucketWidth)).cast("long")
    val ivals = intervals
      .where(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pts = points.withColumn("__bucket", bucketOf(col(pointCol)))
    pts.join(ivals, keys :+ "__bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pair left intervals `[aLo, aHi]` with right
    * intervals `[bLo, bHi]` that overlap (`aLo ≤ bHi ∧ bLo ≤ aHi`,
    * optionally under equi-keys) — validity windows × validity windows,
    * sessions × incidents, shard ranges × shard ranges.
    *
    * Same bucketization as [[pointInInterval]], with one twist: two
    * overlapping intervals share EVERY bucket their intersection covers,
    * so a bare bucket equi-join would emit the pair once per shared
    * bucket. Instead of a distinct pass (a full extra shuffle of the
    * output), the join keeps a pair only in the FIRST bucket both cover —
    * `bucket == max(floor(aLo/w), floor(bLo/w))` — which every
    * overlapping pair satisfies in exactly one bucket and disjoint pairs
    * never do. Replication cost is ×(span/w + 1) per side, as before;
    * negative-length intervals are dropped.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String, bucketWidth: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c / lit(bucketWidth)).cast("long")
    val l = left.where(col(aHi) >= col(aLo))
      .withColumn("__bucket", explode(sequence(bucketOf(col(aLo)), bucketOf(col(aHi)))))
    val r = right.where(col(bHi) >= col(bLo))
      .withColumn("__bucket", explode(sequence(bucketOf(col(bLo)), bucketOf(col(bHi)))))
    l.join(r, keys :+ "__bucket")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bucket") === greatest(bucketOf(col(aLo)), bucketOf(col(bLo))))
      .drop("__bucket")
  }
}
