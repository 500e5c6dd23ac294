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

  /** Deterministic global training order — the "shuffle" step a data
    * loader consumes, computed WITHOUT randomness state and WITHOUT a
    * single-partition window: each row's order key is
    * md5(salt ‖ id) ‖ '|' ‖ id (the md5 scatters, the id suffix makes the
    * key total even under md5 collisions), and its position is the exact
    * global rank of that key via [[Packing.globalCumsum]] — one range
    * exchange, per-range subtotals (≤ partitions longs on the driver),
    * per-range window. A naive `row_number().over(Window.orderBy(key))`
    * computes the same thing on ONE task; this is the shape that still
    * works when the corpus is 10¹¹ rows.
    *
    * The position is a pure function of (id, salt): reshuffling for a new
    * epoch is a salt change, resuming mid-epoch is a `pos >= checkpoint`
    * filter, and any md5-capable engine reproduces the exact order.
    * Output: the input columns plus `pos` (0-based, a permutation of
    * 0..n−1).
    */
  def globalShuffleOrder(df: DataFrame, id: Column,
      salt: String = "shuffle-v1"): DataFrame = {
    val key = concat(
      md5(concat(lit(salt), id.cast("string")).cast("binary")),
      lit("|"), id.cast("string"))
    Packing.globalCumsum(df.withColumn("__shufkey", key),
        col("__shufkey"), lit(1L))
      .withColumn("pos", col("cum") - 1L)
      .drop("cum", "__shufkey")
  }

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

  /** STRATIFIED deterministic sample: an independent keep-fraction per
    * stratum (e.g. downsample web crawl to 10% while keeping 100% of
    * books). Strata absent from `fractions` keep `defaultFraction`.
    * Membership stays a pure function of (id, salt) — the stratum only
    * selects the threshold — so growing one stratum never reshuffles
    * another's sample, and any engine with md5 reproduces the selection.
    */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val key = hexKey(id, salt)
    val thr = fractions.foldLeft[Option[Column]](None) { case (acc, (s, f)) =>
      val t = lit(thresholdHex(f))
      Some(acc match {
        case None    => when(stratum === lit(s), t)
        case Some(e) => e.when(stratum === lit(s), t)
      })
    } match {
      case None    => lit(thresholdHex(defaultFraction))
      case Some(e) => e.otherwise(lit(thresholdHex(defaultFraction)))
    }
    df.where(key < thr)
  }

  /** Cap rows per group at `n`, deterministically: rank by md5 hex (id as
    * tiebreak) inside each group and keep the first n — "at most 50k docs
    * per domain" without any dependence on arrival order or partitioning.
    * One shuffle on the group column; Spark's WindowGroupLimit pushes the
    * rank-≤-n filter map-side, so the shuffle carries at most ~n rows per
    * group per map task, not the whole group.
    */
  def capPerGroup(df: DataFrame, group: Column, id: Column, n: Int,
      salt: String = "graft"): DataFrame = {
    require(n > 0, s"capPerGroup needs a positive cap, got $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(group)
      .orderBy(hexKey(id, salt).asc, id.asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .drop("__rk")
  }

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

  /** Weighted (temperature) source mixing — the corpus-assembly step that
    * up/down-weights data sources before training ("books ×2.5, crawl
    * ×0.5"). A row with weight w is emitted floor(w) times always, plus
    * one more iff its md5 bucket falls under frac(w) — so expected copies
    * = w exactly, membership of the fractional copy is the same pure
    * function of (id, salt) as every sampler here, and replicas are
    * distinguished by an `epoch` column (0-based) for downstream
    * shuffling/curriculum logic.
    *
    * Map-only (a literal CASE over the weight table plus one explode); no
    * shuffle, no RNG state — any engine with md5 reproduces the exact
    * multiset. Sources absent from `weights` take `defaultWeight`; w = 0
    * drops the source entirely (explode of an empty sequence).
    */
  def weightedMix(df: DataFrame, id: Column, stratum: Column,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 64.0),
      "weights must be in [0, 64] (an epoch factor, not a free multiplier)")
    val key = hexKey(id, salt)
    def caseOver[A](f: Double => A, toLit: A => Column): Column = {
      val e0 = weights.toSeq.sortBy(_._1).foldLeft[Option[Column]](None) {
        case (acc, (s, w)) =>
          Some(acc match {
            case None    => when(stratum === lit(s), toLit(f(w)))
            case Some(e) => e.when(stratum === lit(s), toLit(f(w)))
          })
      }
      e0 match {
        case None    => toLit(f(defaultWeight))
        case Some(e) => e.otherwise(toLit(f(defaultWeight)))
      }
    }
    val floorCopies = caseOver[Int](w => math.floor(w).toInt, (i: Int) => lit(i))
    val fracThr = caseOver[String](w => thresholdHex(w - math.floor(w)), (s: String) => lit(s))
    val nCopies = floorCopies + when(key < fracThr, 1).otherwise(0)
    // explode(null) drops the row — exactly right for nCopies == 0
    df.withColumn("epoch",
      explode(when(nCopies > 0, sequence(lit(0), nCopies - 1))))
  }

  /** Temperature-rebalanced source sampling — the multilingual/multi-domain
    * rebalancing step of modern pretraining mixes: target share of source
    * s ∝ count_s^T, so T=1 keeps natural proportions and T→0 flattens
    * toward uniform; small sources are upweighted RELATIVE to large ones.
    * This is the T = 0.5 (square-root) instance — the common published
    * choice — kept exact so an external engine reproduces the selection:
    *
    *  - w_s = floor(sqrt(count_s)·10⁶): sqrt and the one multiply are
    *    correctly-rounded IEEE (identical on any conforming engine),
    *    floor is exact — no round(), whose half-way tie semantics differ
    *    between engines;
    *  - W = Σ w_s is an exact integer sum (order-free);
    *  - keep rate_s = min(1, ((targetRows·w_s) / W) / count_s): two
    *    divisions in a FIXED order, each correctly rounded, inputs exact
    *    integers < 2⁵³;
    *  - membership = the same md5 bucket threshold every sampler here
    *    uses, with the 8-hex threshold floor(rate·2³²) computed inside
    *    the plan.
    *
    * Scale shape: one count aggregate on the source key, a broadcast of
    * the |sources|-row rate table, then a map-only filter — no second
    * shuffle, no RNG state. Sources with rate ≥ 1 keep every row (this
    * operator downsamples the mix toward the target; pair with
    * [[weightedMix]] when small sources must be UPsampled past 1 epoch).
    * Output: input rows + (rate_hex) dropped, i.e. (id, source) columns
    * as given plus nothing synthetic — callers see a filtered df.
    * Rows with a NULL stratum are excluded — both from the output and
    * from the weight table (a null source would inflate W and depress
    * every real source's keep rate without ever being keepable itself).
    */
  def temperatureMixSqrt(df: DataFrame, id: Column, stratum: Column,
      targetRows: Long, salt: String = "graft"): DataFrame = {
    require(targetRows >= 0, s"targetRows must be >= 0, got $targetRows")
    // NULL-stratum rows are EXCLUDED from the mix entirely: they could
    // never be kept anyway (the stratum === __src equi-join below never
    // matches null), so counting them as a source would only inflate
    // __wsum and silently depress every real source's keep rate below
    // the target.
    val counts = df.where(stratum.isNotNull)
      .groupBy(stratum.as("__src")).agg(count(lit(1)).as("__c"))
      .withColumn("__w", floor(sqrt(col("__c").cast("double")) * 1e6).cast("long"))
    // NOT "__W": Spark's resolver is case-insensitive by default, so a
    // name differing from "__w" only by case is ambiguous after the join.
    val tot = counts.agg(sum("__w").as("__wsum"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__rate",
        least(((lit(targetRows) * col("__w")) / col("__wsum")) / col("__c"), lit(1.0)))
      .withColumn("__thr",
        when(col("__rate") >= 1.0, lit("g"))
          .otherwise(lpad(lower(hex(floor(col("__rate") * lit(4294967296.0))
            .cast("long"))), 8, "0")))
      .select(col("__src"), col("__thr"))
    df.join(broadcast(rates), stratum === col("__src"))
      .where(hexKey(id, salt) < col("__thr"))
      .drop("__src", "__thr")
  }

  /** Leakage-safe train/eval splits: near-duplicate documents must land
    * in the SAME split, or the eval set silently contains paraphrases of
    * training rows and measures memorization instead of generalization —
    * the standard contamination failure mode of naive per-document
    * splitting. The split is therefore a pure function of the document's
    * duplicate-CLUSTER id (connected components over `edges`, any dedup
    * path's pair output), not of the document id: every member inherits
    * its component's assignment, singletons behave exactly like
    * [[assignSplits]] on their own id (component == id for them).
    *
    * Scale shape: components are `Dedup.assignClusters` (O(log n)
    * large-star/small-star over the pair edges, never all-pairs); the
    * split itself is the same map-only md5 CASE as [[assignSplits]].
    * Output: (id, component, split).
    */
  def leakageSafeSplits(df: DataFrame, id: Column, edges: DataFrame,
      weights: Seq[(String, Double)], salt: String = "graft"): DataFrame =
    assignSplits(Dedup.assignClusters(df, id, edges), col("component"), weights, salt)

  /** Deterministic budget-bounded subset: keep rows in md5-priority
    * order until the running `cost` total (tokens, characters, bytes…)
    * reaches `budget` — "give me a 1B-token slice of this corpus" as a
    * pure function of (id, salt), reproducible by any engine with md5.
    * Rows are ranked by the same 8-hex-char bucket key every sampler
    * here uses (id decimal-zero-padded as tie-break, so the order is
    * total), the running total is [[Packing.globalCumsum]] — a range
    * exchange plus per-range offsets, NOT a single-task global window —
    * and a row is kept iff its inclusive running total is ≤ `budget`.
    * Output: (id, cost, cum) for the kept rows.
    *
    * The boundary row that would cross the budget is dropped (its
    * inclusive total exceeds it), so the kept total is always ≤ budget
    * and the result is prefix-closed: raising the budget only ever ADDS
    * rows, it never reshuffles membership — the property that lets a
    * pipeline grow a sample without invalidating earlier work.
    */
  def sampleToBudget(df: DataFrame, id: Column, cost: Column, budget: Long,
      salt: String = "graft"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val keyed = df.select(id.cast("long").as("id"), cost.cast("long").as("cost"))
      .withColumn("__pri",
        concat(hexKey(col("id"), salt), lpad(col("id").cast("string"), 20, "0")))
    Packing.globalCumsum(keyed, col("__pri"), col("cost"))
      .where(col("cum") <= budget)
      .select(col("id"), col("cost"), col("cum"))
  }

  /** Per-GROUP budget cap — the domain-balanced sibling of
    * [[sampleToBudget]] and the cost-weighted sibling of [[capPerGroup]]:
    * within each group (domain, source, language…), keep rows in
    * md5-priority order until the group's running cost total reaches
    * `budget` — "at most a million tokens per domain", with membership a
    * pure function of (id, salt) and the same prefix-closure property
    * (raising the budget only adds rows). Unlike the global form this
    * needs no distributed prefix-sum machinery: ONE keyed exchange on the
    * group column, then a per-group running sum — each group's window is
    * linear within its partition, which is exactly how the data already
    * hangs together after the shuffle. Skewed giant groups cost what
    * they cost to scan; nothing is ever collected.
    * Output: (grp, id, cost, cum) for the kept rows.
    */
  def capPerGroupBudget(df: DataFrame, group: Column, id: Column, cost: Column,
      budget: Long, salt: String = "graft"): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val keyed = df.select(group.as("grp"), id.cast("long").as("id"),
        cost.cast("long").as("cost"))
      .withColumn("__pri",
        concat(hexKey(col("id"), salt), lpad(col("id").cast("string"), 20, "0")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("__pri")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    keyed.withColumn("cum", sum(col("cost")).over(w))
      .where(col("cum") <= budget)
      .select(col("grp"), col("id"), col("cost"), col("cum"))
  }

  /** Per-key event-rate cap: keep at most `n` events per (key,
    * time-bucket) in strict (ts, tie-break) order — the ingest throttle
    * against bot floods and the per-user example cap in one shape.
    * Bucketing is integral (`tus div windowMicros`), the kept set is a
    * pure function of the data (tie-break makes the per-bucket order
    * total), and the plan is ONE keyed window — the composite partition
    * key (key, bucket) also spreads a single hot key's history across
    * time buckets instead of one monster partition.
    * Output: input columns + `bucket` and `rn` (1-based within bucket).
    */
  def capPerKeyWindow(df: DataFrame, key: Column, tsMicros: Column,
      tieBreak: Column, windowMicros: Long, n: Int): DataFrame = {
    require(windowMicros > 0 && n > 0, s"need windowMicros>0, n>0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__k", "bucket").orderBy("__tus", "__tb")
    df.withColumn("__k", key).withColumn("__tus", tsMicros)
      .withColumn("__tb", tieBreak)
      .withColumn("bucket", expr(s"__tus div ${windowMicros}L"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .drop("__k", "__tus", "__tb")
  }

  /** Time-based train/eval split with an embargo gap — the leakage rule
    * for TEMPORAL data (hash splits are the rule for i.i.d. corpora;
    * [[leakageSafeSplits]] for near-duplicate corpora): train is
    * everything strictly before the cutoff, eval everything at or after
    * cutoff+embargo, and the embargo band between them is DROPPED so
    * windowed features computed at train time cannot straddle into eval
    * labels. The cutoff is derived integrally from the observed time
    * range (min + range·permille/1000), so the assignment is a pure
    * function of the corpus, portable across engines — no double
    * quantile interpolation to disagree over.
    * Plan: one one-row bounds aggregate broadcast into a map-only filter.
    */
  def temporalSplit(df: DataFrame, tsMicros: Column, trainPermille: Int,
      embargoMicros: Long): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille in [0,1000], got $trainPermille")
    require(embargoMicros >= 0, s"embargo must be >= 0")
    val b = df.select(tsMicros.as("__tus"))
      .agg(min("__tus").as("__t0"), max("__tus").as("__t1"))
    df.withColumn("__tus", tsMicros)
      .crossJoin(broadcast(b))
      .withColumn("__cut",
        col("__t0") + expr(s"((__t1 - __t0) * ${trainPermille}L) div 1000"))
      .withColumn("split",
        when(col("__tus") < col("__cut"), "train")
          .when(col("__tus") >= col("__cut") + lit(embargoMicros), "eval"))
      .where(col("split").isNotNull)
      .drop("__tus", "__t0", "__t1", "__cut")
  }
}
