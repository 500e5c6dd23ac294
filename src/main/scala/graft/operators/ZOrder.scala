package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZFunctions

/** Multi-dimensional write clustering on a Morton (Z-order) curve.
  *
  * `option("sortBy", c)` (the colf writer's single-dimension clustering)
  * gives perfect file-level min/max skipping on c and NONE on any other
  * column. Z-ordering interleaves the quantile-bucket bits of several
  * columns into one sort key, so each written file covers a small
  * hyper-rectangle of the value space — a filter on ANY of the clustered
  * dimensions prunes most files. This is the layout step Delta/Iceberg
  * call OPTIMIZE ZORDER BY; here it composes with any ordered sink (colf
  * via its writer stats, parquet via row-group stats).
  *
  * Cost model at 100 TB: one `approxQuantile` sampling pass (driver holds
  * 2^bits − 1 boundaries per dimension — a few KB, NOT data), then one
  * range exchange on the z key and an in-partition sort: exactly the
  * price of a single-column clustered write, amortized over every future
  * multi-dimension probe.
  */
object ZOrder {

  /** Compute per-dimension quantile boundaries: 2^bits − 1 interior cuts.
    * Columns are cast to double first (numeric/date dimensions only —
    * clustering strings belongs to the dictionary/Bloom path, not z-order).
    */
  def quantileBounds(df: DataFrame, cols: Seq[String], bits: Int,
      relErr: Double = 0.001): Array[Array[Double]] = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, relErr)
  }

  /** Return `df` redistributed and ordered along the z-curve of `cols`,
    * ready for any ordered write (`.write.format("colf")`, parquet, ...).
    * `numPartitions` sizes the range exchange (0 = the session shuffle
    * parallelism); each output partition becomes one file holding one
    * contiguous z-range ≈ one hyper-rectangle of the clustered space.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0, relErr: Double = 0.001): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"z-order needs 2..8 dimensions, got ${cols.size} (one dimension is plain sortBy)")
    require(bits >= 1 && cols.size * bits <= 63,
      s"dims*bits must fit a long, got ${cols.size} * $bits")
    val bounds = quantileBounds(df, cols, bits, relErr)
    require(bounds.forall(_.nonEmpty),
      s"empty quantile bounds — no non-null rows in ${cols.mkString(", ")}")
    val z = ZFunctions.zValue(cols.map(c => col(c).cast("double")), bounds)
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
