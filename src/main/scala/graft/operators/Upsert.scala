package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert as a batch operator: `updates` rows replace same-key
  * `target` rows, new-key updates insert, everything else passes through
  * — the "matched ⇒ update, not matched ⇒ insert" core of SQL MERGE.
  *
  * Shuffle shape: ONE hash shuffle of the union, not a join. The union
  * carries a 1-byte priority; the winner per key is a `min_by` aggregate
  * (map-side partial agg, no window sort) — the same survivor-selection
  * shape as [[Dedup.exactKeepFirst]], which survives heavily-duplicated
  * keys at scale because each map task forwards one candidate per key.
  * A join-based MERGE shuffles target AND updates separately and then
  * unions; this is strictly less movement for the same result.
  *
  * Precondition (standard MERGE constraint): at most one update row per
  * key — with several, the survivor among them is the first by the
  * priority tie, which is not defined. The reference engine has no write
  * surface beyond whole files; combined with the colf writer's dynamic
  * partition overwrite, this operator gives "recompute and re-merge one
  * day" without rewriting untouched partitions.
  */
object Upsert {

  def apply(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val cols = target.columns.toSeq
    require(keys.forall(cols.contains),
      s"upsert keys ${keys.filterNot(cols.contains).mkString(", ")} not in target schema")
    val payload = cols.filterNot(keys.contains)
    // all-key schema: replace/insert/pass-through degenerate to set union
    if (payload.isEmpty)
      return target.unionByName(updates.select(cols.map(col): _*)).distinct()
    // align the update schema to the target's column order
    val u = updates.select(cols.map(col): _*).withColumn("__prio", lit(0))
    val t = target.withColumn("__prio", lit(1))
    val merged = u.unionByName(t)
      .groupBy(keys.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*), col("__prio")).as("__row"))
    merged.select(cols.map { c =>
      (if (keys.contains(c)) col(c) else col(s"__row.$c")).as(c)
    }: _*)
  }
}
