package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: map a document corpus onto fixed-token-budget
  * training examples the way pretraining data loaders actually consume it
  * — concatenate all documents in a deterministic order and cut the token
  * stream every `budget` tokens, letting documents SPAN example
  * boundaries. (Contrast [[TextAnalysis.chunkTokens]], which windows each
  * document independently.)
  *
  * The whole computation reduces to an exact global prefix sum of token
  * counts in the corpus order — which a naive window
  * (`sum(...).over(Window.orderBy(id))` with no partitionBy) computes on
  * ONE task and therefore cannot scale. [[globalCumsum]] is the
  * distributed form: one range exchange on the order column, per-range
  * subtotals (a bounded driver-side array, one long per partition — not
  * data), then a per-range window with the range's offset added. The
  * result is a pure function of the data — partition boundaries shift
  * WHERE rows are summed, never WHAT the cumulative value is.
  */
object Packing {

  /** Exact global running total of `valueCol` in `orderCol` order,
    * returned as column `cum` (inclusive: the sum up to AND including the
    * row). `orderCol` must be unique — it defines the corpus order, so
    * ties would make "the" prefix sum ambiguous.
    *
    * The ranged intermediate is reused twice (offsets pass + output
    * pass) via an eager `localCheckpoint`, NOT `persist`: checkpoint
    * blocks are owned by the returned Dataset and reclaimed by the
    * context cleaner once it is unreferenced, where a CacheManager entry
    * would leak for the session lifetime on every invocation (the
    * Graph.kCore discipline). Caveat shared with kCore: localCheckpoint
    * blocks don't survive executor loss — in cluster mode a lost
    * executor makes downstream recomputation fail rather than recompute;
    * reliable `checkpoint()` is the cluster-HA variant.
    */
  def globalCumsum(df: DataFrame, orderCol: Column, valueCol: Column,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .withColumn("__ord", orderCol).withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, col("__ord"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Bounded driver step: ONE row per range partition (≤ `parts` longs),
    // cumulated on the driver — the offsets table, not a data collect.
    val totals = ranged.groupBy("__pid").agg(sum(col("__v")).as("t"))
      .orderBy("__pid").collect()
    var acc = 0L
    val offsets = totals.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }.toSeq
    val offsetDf = df.sparkSession.createDataFrame(offsets).toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy("__ord")
    ranged.join(broadcast(offsetDf), "__pid")
      .withColumn("cum", sum(col("__v")).over(w) + col("__off"))
      .drop("__pid", "__off", "__ord", "__v")
  }

  /** Exact global 1-based row number in `orderCol` order, as column
    * `out` — [[globalCumsum]] over a constant 1, i.e. the distributed
    * replacement for `row_number().over(Window.orderBy(...))`, which
    * plans a SINGLE-partition sort and cannot scale. `orderCol` must be
    * a total order (compose a `struct(key, tieBreak)` when the primary
    * key ties); the result is a pure function of the data, independent
    * of partitioning.
    */
  def globalRowNumber(df: DataFrame, orderCol: Column, out: String = "rank",
      numPartitions: Int = 0): DataFrame =
    globalCumsum(df.withColumn("__one", lit(1L)), orderCol, col("__one"),
        numPartitions)
      .withColumnRenamed("cum", out).drop("__one")

  /** Pack the corpus token stream into `budget`-token examples: every doc
    * (in `id` order) occupies token range [cum − n, cum); example k owns
    * tokens [k·budget, (k+1)·budget). Output: one row per (doc, example)
    * overlap — (id, n_tokens, pack_id, pack_offset, n_in_pack), where
    * pack_offset is the doc fragment's first token position INSIDE the
    * example. Map-only after the prefix sum; null-text docs are dropped
    * (they contribute no tokens).
    */
  def packTokenStream(df: DataFrame, id: Column, text: Column,
      budget: Int, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val docs = df.where(text.isNotNull)
      .select(id.as("id"), TextAnalysis.tokenCount(text).as("n_tokens"))
    val cum = globalCumsum(docs, col("id"), col("n_tokens"), numPartitions)
    // `div`, not `/`: Spark's `/` is double division, and a 100-TB token
    // stream sits near 2^53 where double loses integer exactness.
    cum
      .withColumn("__start", col("cum") - col("n_tokens"))
      .withColumn("pack_id",
        explode(sequence(expr(s"__start div $budget"), expr(s"(cum - 1) div $budget"))))
      .select(col("id"), col("n_tokens"), col("pack_id"),
        (greatest(col("__start"), col("pack_id") * budget) - col("pack_id") * budget)
          .cast("long").as("pack_offset"),
        (least(col("cum"), (col("pack_id") + 1) * budget) -
          greatest(col("__start"), col("pack_id") * budget)).cast("long").as("n_in_pack"))
  }
}
