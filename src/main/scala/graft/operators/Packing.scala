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

  /** Shared cleaner thread: releases a globalCumsum invocation's cache
    * entry once the returned plan becomes unreachable (see
    * [[globalCumsum]]'s lifecycle note).
    */
  private val cleaner = java.lang.ref.Cleaner.create()

  /** Deterministic backstop for the GC-driven Cleaner: at most this many
    * globalCumsum caches live at once — each new invocation retires the
    * oldest beyond the cap (FIFO). The Cleaner only fires after a GC
    * collects the dead plan nodes, so a tight loop of invocations (a
    * bench, a backfill) could otherwise accumulate dead cached tables
    * until the next old-gen GC. Eviction is SAFE by construction: buckets
    * are data-keyed, so a still-referenced plan whose cache was retired
    * silently recomputes the identical result (PackingSpec pins this).
    */
  private val MaxLiveCaches = 8
  private val liveCaches = new java.util.ArrayDeque[DataFrame]()

  private def trackCache(ranged: DataFrame): Unit = liveCaches.synchronized {
    liveCaches.addLast(ranged)
    while (liveCaches.size > MaxLiveCaches)
      liveCaches.removeFirst().unpersist(false)
  }

  /** Exact global running total of `valueCol` in `orderCol` order,
    * returned as column `cum` (inclusive: the sum up to AND including the
    * row). `orderCol` must be unique and non-null — it defines the corpus
    * order, so ties would make "the" prefix sum ambiguous.
    *
    * Shape: the naive window (`sum over Window.orderBy`) is a
    * single-partition sort and cannot scale; the distributed form is
    * bucket-by-order-range, per-bucket window, plus each bucket's prefix
    * offset. One range exchange balances the buckets; ONE driver-side
    * pass over it collects (Σ value, max order key) per range — ≤ `parts`
    * rows, an offsets table, not data.
    *
    * Determinism (the r12→r14 history): the bucket id downstream used to
    * be `spark_partition_id()`, which depends on `RangePartitioner`'s
    * RANDOM sample (seeded from the RDD id) — so ANY recomputation of the
    * ranged table silently reassigned boundary rows, and the intermediate
    * had to be pinned at all costs (r12's `persist` leaked a
    * session-lifetime CacheManager entry per invocation; r13's eager
    * `localCheckpoint` paid a dedicated full-scan materialization job and
    * still died on executor loss). r14 instead keys every downstream
    * consumer on the DATA: the collected per-range `max(__ord)` values
    * form an ascending boundary array (ranges are contiguous and ordered
    * by pid), and [[graft.functions.RangeBucket]] re-derives each row's
    * bucket by codegen'd binary search against that immutable array.
    * `spark_partition_id` is consumed ONLY inside the one driver-collected
    * pass; if the cache is lost and the exchange re-executes with
    * different physical placement, the bucket — and therefore `cum` — is
    * unchanged. Executor loss, speculative retries, and post-release
    * derived plans all recompute correctly from lineage.
    *
    * Cache lifecycle: with correctness decoupled from physical placement,
    * the persisted ranged table is a pure optimization (it feeds the
    * offsets pass and the caller's output actions at columnar-cache
    * speed). A [[java.lang.ref.Cleaner]] unpersists it once the returned
    * plan is garbage-collected — no session-lifetime leak, and a derived
    * plan that runs after release silently recomputes the right answer.
    */
  def globalCumsum(df: DataFrame, orderCol: Column, valueCol: Column,
      numPartitions: Int = 0): DataFrame =
    globalCumsumMulti(df, orderCol, Seq(valueCol -> "cum"), numPartitions)

  /** [[globalCumsum]] for SEVERAL value columns in ONE pass: each
    * (value, outName) gets its exact inclusive running total, all riding
    * the same range exchange, the same per-range totals collect (one row
    * per partition carrying every column's subtotal), and the same
    * per-bucket window — so k simultaneous prefix sums cost one shuffle
    * instead of k (the [[graft.operators.Analytics.ksTest2]] shape: both
    * samples' CDFs over one shared value axis).
    */
  def globalCumsumMulti(df: DataFrame, orderCol: Column,
      values: Seq[(Column, String)], numPartitions: Int = 0): DataFrame = {
    require(values.nonEmpty, "globalCumsumMulti needs at least one value column")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val vNames = values.indices.map(i => s"__v$i")
    val offNames = values.indices.map(i => s"__off$i")
    // __pid is baked into the cached projection (a stored column, not a
    // grouping over the nondeterministic-flagged spark_partition_id(),
    // which would deoptimize the totals aggregate) and consumed ONLY by
    // the driver-collected pass below — nothing downstream keys on it.
    val ranged = values.zip(vNames)
      .foldLeft(df.withColumn("__ord", orderCol)) { case (acc, ((c, _), n)) =>
        acc.withColumn(n, c.cast("long"))
      }
      .repartitionByRange(parts, col("__ord"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ordType = ranged.schema("__ord").dataType
    // Bounded driver step: ONE row per non-empty range partition
    // (≤ `parts` rows), cumulated on the driver. Range partitions are
    // contiguous ord intervals ordered by pid, so the per-partition max
    // ords form the ascending boundary array and the dense index i is
    // the bucket id.
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(vNames.head)).as("t0"),
        (vNames.tail.zipWithIndex.map { case (n, i) => sum(col(n)).as(s"t${i + 1}") } :+
          max(col("__ord")).as("mx")): _*)
      .orderBy("__pid").collect()
    val acc = new Array[Long](values.size)
    val offsetRows = totals.zipWithIndex.map { case (r, i) =>
      val row = org.apache.spark.sql.Row.fromSeq(i +: acc.toSeq)
      for (j <- values.indices) acc(j) += r.getLong(1 + j)
      row
    }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__bkt",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        offNames.map(n => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType, nullable = false)))
    val offsetDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*), offSchema)
    val uppers = totals.map(_.get(1 + values.size)).toSeq
    val w = Window.partitionBy("__bkt").orderBy("__ord")
    val out = values.zipWithIndex
      .foldLeft(ranged
        .withColumn("__bkt", graft.functions.RangeBucket(col("__ord"), uppers, ordType))
        .join(broadcast(offsetDf), "__bkt")) { case (acc0, ((_, name), i)) =>
        acc0.withColumn(name, sum(col(s"__v$i")).over(w) + col(s"__off$i"))
      }
      .drop(Seq("__pid", "__bkt", "__ord") ++ vNames ++ offNames: _*)
    // Register on `out`'s logical plan NODE, not `out`: callers derive new
    // Datasets from `out` and drop it immediately, but every derived plan
    // embeds this node as a subtree, keeping it — and therefore the cache —
    // reachable for exactly as long as something could still read it.
    // (CacheManager pins only the `ranged` subtree BELOW it; child
    // pointers never keep parents alive.) The cleanup action must not
    // capture the registered node — it captures `ranged`, whose unpersist
    // is idempotent and non-blocking.
    cleaner.register(org.apache.spark.sql.GraftSqlBridge.logicalPlanOf(out),
      () => ranged.unpersist(false))
    trackCache(ranged) // FIFO cap — the GC-independent backstop
    out
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
      budget: Int, numPartitions: Int = 0): DataFrame =
    packCounted(
      df.where(text.isNotNull)
        .select(id.as("id"), TextAnalysis.tokenCount(text).as("n_tokens")),
      budget, numPartitions)

  /** [[packTokenStream]] over a caller-supplied token-count table —
    * (id, n_tokens), one row per doc — so the budget can be measured by
    * ANY counter: whitespace tokens (the default above), real BPE merged
    * tokens ([[Bpe.packTokenStream]]), or an external tokenizer's counts
    * joined in as a table.
    */
  def packCounted(counts: DataFrame, budget: Int, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // Zero-token docs occupy no pack — and MUST be dropped before the
    // explode: with cum == __start, `sequence(a, a-1)` would count DOWN
    // (Spark's default step is -1 when start > stop) and emit two bogus
    // rows. Unreachable from whitespace counts (always ≥ 1) but real for
    // BPE counts (empty text, a lone apostrophe).
    val nonEmpty = counts.where(col("n_tokens") > 0)
    val cum = globalCumsum(nonEmpty, col("id"), col("n_tokens"), numPartitions)
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
