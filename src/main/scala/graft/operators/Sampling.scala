package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling and splitting — the
  * reproducibility primitive of a training pipeline. `df.sample()` is
  * partitioning-dependent (a repartition or retry reassigns rows);
  * hashing each row's ID instead makes membership a pure function of
  * (id, salt): stable across runs, clusters, partitionings and engines,
  * and a row keeps its split when the corpus around it grows.
  *
  * Mechanism: the first 8 hex chars of md5(salt ‖ id) are a uniform
  * 32-bit bucket; fraction f keeps buckets below floor(f·2³²). The
  * comparison happens on the fixed-width lowercase hex STRING, which
  * orders identically to the number — and identically in any engine with
  * md5, so an external system can reproduce the exact membership.
  */
object Sampling {

  private def hexKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 8)

  /** floor(f·2³²) as 8 lowercase hex chars (the bucket-space threshold). */
  private[graft] def thresholdHex(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f")
    val t = math.min(math.floor(f * 4294967296.0).toLong, 4294967296L)
    if (t >= 4294967296L) "g" else f"$t%08x" // "g" > any hex char: keep all
  }

  /** Keep ~`fraction` of rows, deterministically by id. */
  def deterministicSample(df: DataFrame, id: Column, fraction: Double,
      salt: String = "graft"): DataFrame =
    df.where(hexKey(id, salt) < lit(thresholdHex(fraction)))

  /** Assign every row a named split with the given weights (must sum to
    * ~1; the last split takes the remainder). Returns the input plus a
    * `split` column.
    */
  def assignSplits(df: DataFrame, id: Column, weights: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "assignSplits needs at least one split")
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val key = hexKey(id, salt)
    val expr0 = weights.init.zip(cum.init).foldLeft[Option[Column]](None) {
      case (acc, ((name, _), c)) =>
        val cond = key < lit(thresholdHex(c))
        Some(acc match {
          case None    => when(cond, lit(name))
          case Some(e) => e.when(cond, lit(name))
        })
    }
    val split = expr0 match {
      case None    => lit(weights.last._1)
      case Some(e) => e.otherwise(lit(weights.last._1))
    }
    df.withColumn("split", split)
  }
}
