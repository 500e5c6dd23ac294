package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query is fully materialized through the
  * `noop` sink (exercises the complete plan including result production —
  * `count()` would let Catalyst prune payload columns).
  */
object Bench {

  /** Headline set: the shapes that dominate a real pipeline at scale —
    * scan+agg, the two join regimes, window, format roundtrip, dedup
    * (exact + both LSH variants), similarity, and per-row text analysis.
    */
  val Headline: Seq[String] = Seq(
    "q1_agg", "q_filter_pushdown", "q_join_broadcast", "q_join_large",
    "q_window", "q_topk", "q_events_window", "q_asof_join",
    "q_colf_scan_full", "q_colf_project", "q_colf_agg", "q_colf_filter",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_cosine_lsh",
    "q_dedup_clusters_lsh", "q_dedup_incremental",
    "q_sim_bruteforce", "q_sim_ann", "q_sim_ivf",
    "q_text_stats", "q_quality_score", "q_word_freq", "q_tfidf", "q_sessionize",
    "q_curation_pipeline",
    "q_chunk", "q_pii_redact", "q_colf_zorder", "q_bucketed_join",
    "q_pack", "q_interval_overlap",
    "q_span_dedup", "q_dedup_normalized", "q_upsert", "q_colf_meta_agg",
    "q_dedup_semantic", "q_heavy_hitters", "q_quality_classifier",
    "q_split_safe", "q_sample_budget",
    "q_funnel", "q_retention", "q_anomaly", "q_bm25", "q_kmeans",
    "q_pagerank", "q_skyline", "q_corr", "q_incremental_agg", "q_moving_avg",
    "q_transitions", "q_basket_lift", "q_attribution",
    "q_pit_join", "q_drift",
    "q_lm_score", "q_temperature_mix", "q_mad_outliers", "q_fuzzy_join_fastss",
    "q_lm_score_bigram", "q_dsir_select", "q_nfc_normalize",
    "q_jw_similarity", "q_bpe_token_count", "q_dedup_unicode",
    "q_ohlc_bars", "q_global_order", "q_asof_tolerance",
    "q_hopping_window", "q_sim_int8_rescore", "q_triangles", "q_kcore",
    "q_clustering_coef", "q_bfs", "q_curation_pipeline_v2", "q_rfm", "q_backtest_snaive",
    "q_string_distances", "q_entity_resolution", "q_langid_eval",
    "q_ewma", "q_survival_km", "q_chisq_indep", "q_ks_test", "q_item_cf",
    "q_golden_record", "q_benford",
    "q_l_diversity", "q_holt", "q_sssp", "q_rrf_fusion",
    "q_bpe_encode", "q_dedup_image", "q_pack_bpe", "q_chunk_bpe",
    "q_stream_item_cf", "q_dedup_audio", "q_bpe_train",
    "q_stream_item_cf_colf", "q_dedup_video", "q_bpe_pipeline", "q_label_prop",
    "q_video_containment", "q_holt_winters",
    "q_audio_containment", "q_text_containment", "q_dedup_mp4_exact", "q_stream_ann",
    "q_containment_groups",
  )

  /** Extract a prior round's per-query times from a BENCH artifact of
    * EITHER shape: the raw one-line JSON this main prints, or the
    * driver's wrapper ({"n":9,...,"tail":"{\"metric\":...}"}) whose tail
    * is backslash-escaped AND truncated to the last ~2000 chars — the
    * markers only appear escaped there, and the leading maps may be cut
    * mid-stream. Preference order: `queries_median` (the comparison
    * column since r10), falling back to `queries` (the min map, all
    * pre-median rounds). Returns empty when the artifact is for a
    * DIFFERENT scale factor (cross-sf diffs are noise in both
    * directions) or when no complete map survived truncation — the
    * tripwire is advisory and must never invent a comparison baseline.
    */
  private[graft] def parsePriorQueryTimes(raw: String, sfDir: String): Map[String, Double] = {
    val txt = if (raw.contains("\"queries\":{")) raw else raw.replace("\\\"", "\"")
    def block(key: String): Option[String] = {
      val i = txt.indexOf("\"" + key + "\":{")
      if (i < 0) None
      else {
        val end = txt.indexOf('}', i)
        if (end < 0) None else Some(txt.substring(i, end + 1))
      }
    }
    val sameSf = txt.contains("\"sf\":\"" + sfDir + "\"")
    (if (sameSf) block("queries_median").orElse(block("queries")) else None) match {
      case None => Map.empty
      case Some(b) =>
        "\"([A-Za-z0-9_]+)\":(-?[0-9.Ee+-]+)".r.findAllMatchIn(b)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  /** Regression rows for the tripwire: this run's medians vs a prior
    * artifact's. Two ways onto the list (VERDICT r16 #2): a >1.5×
    * slowdown, and — LOUDER than any slowdown — a query that had a
    * positive prior time and now FAILED (median -1). The r16 board
    * silently dropped q_stream_item_cf_colf's 10.4 s this way: the
    * `med > 0` guard skipped it and the total quietly shrank, reading
    * as a win. Factored out of main so BenchParseSpec can pin both
    * paths without running a bench.
    *
    * Every row carries THIS capture's sentinel inflations (VERDICT r17
    * #1): a reader of a single regression row sees whether the capture
    * that produced it was contention-skewed (r17's driver capture
    * published 12 phantom regressions whose only tell was a
    * calibration_latency block elsewhere in the artifact).
    */
  private[graft] def regressionRows(meds: Seq[(String, Double)],
      prevMap: Map[String, Double], src: String,
      calInflation: Double = -1.0, latInflation: Double = -1.0,
      memInflation: Double = -1.0): Seq[String] = {
    val sentinels = s""","cal_inflation":$calInflation,"lat_inflation":$latInflation""" +
      s""","mem_inflation":$memInflation"""
    meds.flatMap { case (n, med) =>
      prevMap.get(n) match {
        case Some(prev) if prev > 0 && med > 0 && med > prev * 1.5 =>
          Some(s"""{"q":"$n","median":$med,"prev":$prev,"ratio":${
            math.round(med / prev * 100) / 100.0},"vs":"$src"$sentinels}""")
        case Some(prev) if prev > 0 && med < 0 =>
          Some(s"""{"q":"$n","median":-1.0,"prev":$prev,"failed":true,"vs":"$src"$sentinels}""")
        case _ => None
      }
    }
  }

  /** True when a prior artifact self-declares a contention-skewed capture
    * (the `contaminated` tag this bench writes when its own sentinels
    * exceed the gate). Checked raw AND backslash-escaped: the driver's
    * per-round wrapper escapes the whole stdout tail. Artifacts predating
    * the tag (no field at all) are treated as clean — the tag only ever
    * ADDS information.
    */
  private[graft] def isContaminated(raw: String): Boolean =
    raw.contains("\"contaminated\":true") || raw.contains("\\\"contaminated\\\":true")

  /** Tripwire baseline selection over (name, rawContent) candidates, in
    * preference (recency) order. Two rules, both bought by r17 failures:
    *   1. A candidate that self-declares `contaminated:true` is skipped
    *      outright (r17: the driver's stall-mode capture became the r18
    *      baseline and would have masked real regressions behind its 12
    *      inflated priors).
    *   2. Among the clean candidates, the one with the MOST entries that
    *      OVERLAP the current headline set wins, ties broken by recency
    *      (candidates arrive recency-ordered and maxBy keeps the first
    *      maximum) — a 3-query isolation probe or a tail-truncated
    *      wrapper must never shadow a complete clean board (r17: a probe
    *      overwrote BENCH_full_latest.json and left the tripwire
    *      comparing 3 queries). Ranking by OVERLAP rather than raw entry
    *      count (ADVICE r18) keeps the rule self-correcting when the
    *      headline set changes: a stale board full of removed/renamed
    *      queries scores only on what it can still compare, so it cannot
    *      permanently out-rank every newer baseline.
    */
  private[graft] def choosePrior(candidates: Seq[(String, String)],
      sfDir: String, headline: Set[String]): Option[(String, Map[String, Double])] = {
    val parsed = candidates.flatMap { case (name, raw) =>
      if (isContaminated(raw)) {
        System.err.println(s"[bench] tripwire: skipping $name " +
          "(self-declared contaminated capture)")
        None
      } else Some(name -> parsePriorQueryTimes(raw, sfDir))
    }.filter(_._2.nonEmpty)
    // Overlap must be POSITIVE (ADVICE r19): a clean candidate sharing
    // zero queries with the current headline set (every query renamed,
    // or a different-sf artifact family) would win maxBy with score 0
    // and the tripwire would silently compare nothing — a no-overlap
    // state must be as loud as the no-artifact state.
    val comparable = parsed.filter(_._2.keySet.exists(headline.contains))
    if (comparable.isEmpty) None
    else Some(comparable.maxBy(_._2.keySet.count(headline.contains)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run to a
    // subset (isolation measurements, single-query regressions hunts). The
    // driver never sets it — the full headline always ships.
    val headline: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(s) => val want = s.split(',').map(_.trim).toSet
        Headline.filter(want)
      case None => Headline
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Probe-only deployment knob (VERDICT r18 #2): shuffle width defaults
    // to the thread count (right for the sf0.1 board — the r18 A/B showed
    // 256 initial partitions REGRESSES small iterative rounds), but an
    // sf10+ scale probe sizes it to the data, exactly as a cluster
    // deployment would. The driver never sets it.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // HERMETIC RUNS (r15): clear the session cache after every
    // construction+write, OUTSIDE the timing window. Operators that
    // persist intermediates register CacheManager entries keyed on
    // canonicalized plans; without the clear, runs 2..N of the same query
    // silently read run 1's entries and the median measures cache luck,
    // not plan cost — diagnosed on q_pagerank, where the judge's "1-in-5
    // ~6 s stall" was the COLD run among cache-assisted repeats. Cleaner-
    // scoped caches (Packing.globalCumsum) are pure optimizations with
    // exact recompute, so clearing them is always safe.
    def clearState(): Unit = spark.sharedState.cacheManager.clearCache()
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        clearState()
        return -1.0
      }
      val t = (System.nanoTime() - t0) / 1e9
      clearState()
      t
    }

    /** Repeat each query and keep EVERY run: `queries` reports the min
      * (best estimate of plan cost under machine noise — any slower run
      * was contention, GC, or page-cache misses; the r2 AND r3 driver
      * records were both inflated by exactly that), `queries_median` the
      * median (the round-over-round comparison signal — single-run
      * outliers like first-touch JIT cost the judge adjudication time
      * every round, VERDICT r9 #3), and `queries_max` the worst run (a
      * max/median ratio far above ~2 says the machine was busy — the
      * artifact self-diagnoses a contention-skewed capture). Failures
      * short-circuit to an empty list, reported as -1.
      */
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    def run(name: String): Seq[Double] = {
      val ts = Seq.newBuilder[Double]
      var i = 0
      while (i < runs) {
        val t = runOnce(name)
        if (t < 0) return Seq.empty
        ts += t
        i += 1
      }
      ts.result()
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // One warmup pass on a tiny sf to JIT-compile codegen'd pipelines and
    // warm file-system metadata, so measured numbers reflect steady state.
    // Failures are LOGGED (a missing warmup dir silently skewing headline
    // numbers was ADVICE r2) but don't fail the bench.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (!new java.io.File(warmDir).isDirectory)
      System.err.println(s"[bench] warmup dir $warmDir missing — first-query JIT cost " +
        "will land in the measured numbers (set SPARK_GRAFT_WARM_DIR)")
    headline.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }
    // One untimed run ON THE MEASURED CORPUS before timing starts: the
    // tiny-sf warmup JITs the pipelines but not the data-scale-dependent
    // paths (AQE replans, page-cache fill) — at sf1 the first timed query
    // used to eat ~26s of exactly that (VERDICT r9 #3).
    headline.headOption.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] corpus warmup $n failed: ${e.getMessage}")
      }
    }
    clearState() // warmup cache entries must not assist the timed runs

    // Calibration sentinel (VERDICT r15 #4 / r16 #6): a fixed,
    // data-independent query timed at the start, after every 10th
    // headline query, and at the end. Its plan never changes, so any
    // inflation of later samples over the first measures BOX CONTENTION
    // during the capture — the adjudication signal that separates "the
    // operator regressed" from "the machine was busy" without re-running.
    // Every-10th (r17 carry-over #4): the n=7 cadence straddled stalls
    // that inflated single queries 10x between samples — n~12 halves
    // the blind window at ~4s of added capture time.
    def calOnce(): Double = {
      val t0 = System.nanoTime()
      // hash() is int-valued, so the 64M-row sum stays far from long
      // overflow (ANSI mode aborts on overflow); murmur3-per-row keeps
      // the sentinel CPU-bound rather than a constant-foldable no-op
      spark.range(0L, 64L << 20, 1L, 32)
        .selectExpr("sum(hash(id)) AS s", "count(*) AS n")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Second sentinel, LATENCY mode: four back-to-back single-task
    // trivial jobs time the scheduler/driver round-trip, which the
    // CPU-bound sentinel above cannot see — r17 captures showed
    // iterative queries (one action per round: label_prop, pagerank,
    // sssp) elevated ~2x on a box whose CPU sentinel read normal.
    // With the memory sentinel below, the three separate "cores are
    // slow/stolen" from "job dispatch is slow" from "memory bandwidth
    // is stolen" without re-running anything.
    def latOnce(): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 4) {
        spark.range(0L, 1000L, 1L, 1).selectExpr("sum(id) AS s")
          .write.format("noop").mode("overwrite").save()
        i += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Third sentinel, MEMORY mode (VERDICT r19 #2): the CPU sentinel is a
    // register-arithmetic loop, so a contention mode that steals MEMORY
    // BANDWIDTH/cache — the mode JPEG/AVI/PCM decode feels at ~1.3× while
    // the CPU sentinel reads its cleanest of the session (the r19
    // containment adjudications) — is invisible to it. This one is built
    // to feel exactly that: 32 parallel tasks each pointer-chase an 8 MiB
    // private long array (every read's address derives from the previous
    // value — dependent DRAM latency, no prefetch), ~256 MiB aggregate
    // working set, far past L3. Decode-skewed windows now self-declare
    // instead of costing a manual per-row adjudication.
    def memOnce(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.range(0L, 32L, 1L, 32).map { seed =>
        val n = 1 << 20 // 1M longs = 8 MiB per task
        val a = new Array[Long](n)
        var x = seed * 0x9E3779B97F4A7C15L + 1L
        var i = 0
        while (i < n) {
          x = x * 6364136223846793005L + 1442695040888963407L
          a(i) = x
          i += 1
        }
        var acc = 0L
        var idx = (seed & (n - 1)).toInt
        var j = 0
        while (j < (n << 3)) { // 8M dependent reads per task: ~0.2-0.4s,
          val v = a(idx)      // long enough that task-dispatch jitter
          acc ^= v            // (~10-20ms) can't fake an inflation
          idx = ((v >>> 7) & (n - 1)).toInt
          j += 1
        }
        acc
      }.reduce(_ ^ _)
      (System.nanoTime() - t0) / 1e9
    }
    calOnce(); latOnce(); memOnce() // JIT the sentinels themselves; untimed
    // Each sample records its POSITION: the index of the next headline
    // query (0 = before any, headline.size = after all). The per-sample
    // arrays land in the artifact (VERDICT r17 #2) so a stall window can
    // be correlated to the specific queries it straddled — r17's closing
    // board carried two single-run stalls (q_drift, q_pit_join) that cost
    // a manual four-capture adjudication for lack of exactly this.
    val calSamples = scala.collection.mutable.ArrayBuffer[(Int, Double)](0 -> calOnce())
    val latSamples = scala.collection.mutable.ArrayBuffer[(Int, Double)](0 -> latOnce())
    val memSamples = scala.collection.mutable.ArrayBuffer[(Int, Double)](0 -> memOnce())
    val results = headline.zipWithIndex.map { case (n, i) =>
      if (i % 10 == 9) {
        calSamples += (i + 1) -> calOnce()
        latSamples += (i + 1) -> latOnce()
        memSamples += (i + 1) -> memOnce()
      }
      n -> run(n)
    }
    calSamples += headline.size -> calOnce()
    latSamples += headline.size -> latOnce()
    memSamples += headline.size -> memOnce()

    // ANN quality trend: recall@10 of each approximate strategy against the
    // exact brute-force top-k over the same corpus and a 64-query probe set
    // — the rows-only similarity queries carry a quantitative quality
    // number the driver can trend round-over-round, not just a runtime.
    val annRecall: String = if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) ""
    else try {
      import org.apache.spark.sql.functions.col
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val probes = emb.where(col("id") < 64)
      val k = 10
      val exact = Similarity.bruteForceTopK(emb, probes, k)
        .select("query_id", "nbr_id").cache()
      val denom = exact.count().toDouble
      // An empty probe set would make every recall NaN — and
      // math.round(NaN)=0 renders as a misleadingly valid-looking 0.0
      // (ADVICE r9). Throw into the surrounding catch instead: the block
      // is omitted and stderr names the cause.
      if (denom == 0.0) throw new IllegalStateException(
        "empty ANN probe set (no embeddings with id < 64) - skipping ann_recall")
      def recall(approx: org.apache.spark.sql.DataFrame): Double = {
        val hits = exact.join(approx.select("query_id", "nbr_id"),
          Seq("query_id", "nbr_id")).count()
        math.round(hits / denom * 10000) / 10000.0
      }
      // `lsh`/`ivf` are the true out-of-box defaults (auto-planned from
      // the corpus; since r15 RECALL-AWARE — 4-table OR-amplification
      // with concerted bucket sizing, IVF weakest-bit spill — closing
      // the r14 default-recall gap); the pinned-knob entries keep prior
      // rounds' settings measurable round-over-round (tables/spill now
      // pinned to 1 where they always effectively were) and demonstrate
      // each recall/cost lever.
      val lsh = recall(Similarity.lshTopK(emb, probes, k))
      val lshP8 = recall(Similarity.lshTopK(emb, probes, k, planes = 8, tables = 1))
      val lshHi = recall(Similarity.lshTopK(emb, probes, k, planes = 4, tables = 1))
      val lshMt = recall(Similarity.lshTopK(emb, probes, k, planes = 8, tables = 4))
      val ivf = recall(Similarity.ivfTopK(emb, probes, k))
      val ivfN2 = recall(Similarity.ivfTopK(emb, probes, k, coarseBits = 4, nProbe = 2,
        spill = 1))
      val ivfHi = recall(Similarity.ivfTopK(emb, probes, k, coarseBits = 4, nProbe = 8,
        spill = 1))
      val pq = recall(Similarity.pqTopK(emb, probes, k, m = 8, bits = 6, refine = 8))
      val pqHi = recall(Similarity.pqTopK(emb, probes, k, m = 8, bits = 6, refine = 32))
      // Recall per index-size BUDGET (VERDICT r9 #8): tables × 2^planes
      // held at 32 bucket-slots while trading table count against plane
      // depth — measured ground truth for whether OR-amplification or
      // bigger buckets buys more recall at constant index size.
      val b1 = recall(Similarity.lshTopK(emb, probes, k, planes = 5, tables = 1))
      val b2 = recall(Similarity.lshTopK(emb, probes, k, planes = 4, tables = 2))
      val b4 = recall(Similarity.lshTopK(emb, probes, k, planes = 3, tables = 4))
      // Probe COST of the default paths (VERDICT r14 #5's "with the
      // probe cost recorded"): expected scored candidates per query,
      // from the same planner formulas the defaults resolve through.
      val n = emb.count().toDouble
      val t = Similarity.tablesDefault
      val lshPlanes = Similarity.planesFor(n.toLong, math.max(128L, 64L * t))
      val lshCost = math.round(t * (lshPlanes + 1) * n / (1L << lshPlanes))
      val ivfBits = Similarity.ivfBitsFor(n.toLong)
      val ivfCost = math.round(Similarity.nProbeFor(ivfBits).toDouble *
        Similarity.spillDefault * n / (1L << ivfBits))
      exact.unpersist()
      s""","ann_recall":{"k":$k,"probes":64,"lsh":$lsh,"lsh_p8":$lshP8,"lsh_hi":$lshHi,""" +
        s""""lsh_mt4":$lshMt,"ivf":$ivf,"ivf_n2":$ivfN2,"ivf_hi":$ivfHi,"pq":$pq,"pq_hi":$pqHi,""" +
        s""""budget32":{"t1p5":$b1,"t2p4":$b2,"t4p3":$b4},""" +
        s""""default_cost":{"corpus":${n.toLong},"lsh_planes":$lshPlanes,"lsh_tables":$t,""" +
        s""""lsh_cand_per_query":$lshCost,"ivf_bits":$ivfBits,""" +
        s""""ivf_nprobe":${Similarity.nProbeFor(ivfBits)},"ivf_spill":${Similarity.spillDefault},""" +
        s""""ivf_cand_per_query":$ivfCost}}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ann recall failed: ${e.getMessage}"); ""
    }

    // `queries` stays the min map (what the harness reads as the signal);
    // `queries_median` is the round-over-round comparison column;
    // `queries_max` carries the worst run for the integrity check above.
    val mins = results.map { case (n, ts) => n -> (if (ts.isEmpty) -1.0 else ts.min) }
    val meds = results.map { case (n, ts) => n -> median(ts) }
    val maxs = results.map { case (n, ts) => n -> (if (ts.isEmpty) -1.0 else ts.max) }
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    // Regression tripwire (VERDICT r9 #7): diff this run's medians against
    // the newest BENCH_r*.json in the repo root (median map preferred,
    // min map as fallback for pre-median rounds) and carry any >1.5×
    // entries IN the artifact — the judge's round-over-round comparison
    // becomes a driver-visible field instead of a manual diff. Purely
    // advisory — but never SILENTLY empty (VERDICT r10 #3): when the
    // driver artifact's truncated tail yields no parseable map (the r9
    // artifact: tail cut mid-map, "parsed": null), fall back to the
    // COMPLETE BENCH_full_latest.json this bench writes itself, and if
    // that too yields nothing, say "no_comparable_artifact" loudly
    // instead of an indistinguishable-from-healthy [].
    // The clean-baseline file is keyed by the sf basename (sf0.1 etc.) so
    // an sf10 probe can never displace the sf0.1 board's baseline — the
    // r17 sf10 probe overwrote BENCH_full_latest.json between captures
    // and cost the closing run its comparison (ROUND17_NOTES §4.1).
    val sfBase = new java.io.File(sfDir).getName
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo")
    val prior: Option[(String, Map[String, Double])] = try {
      val dir = new java.io.File(benchDir)
      val files: Seq[java.io.File] =
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
          .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
          .lastOption.toSeq ++
        Seq(new java.io.File(dir, "BENCH_full_latest.json"),
            new java.io.File(dir, s"BENCH_full_clean_$sfBase.json")).filter(_.isFile)
      val candidates = files.map { f =>
        f.getName -> new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      }
      val parsed = choosePrior(candidates, sfDir, headline.toSet)
      if (parsed.isEmpty)
        System.err.println(s"[bench] regression tripwire: no comparable " +
          s"prior artifact (tried ${files.map(_.getName).mkString(", ")})")
      parsed
    } catch { case e: Throwable =>
      System.err.println(s"[bench] regression diff failed: ${e.getMessage}")
      None
    }

    // Failures are LOUD (VERDICT r16 #2): `failed` names every query
    // whose runs short-circuited, and when the prior artifact carries
    // their last-known times, `total_with_failed_at_prev` reports what
    // the board would read if they had merely not regressed — so a
    // query falling OFF the board can never masquerade as a speedup.
    val failedQs = results.collect { case (n, ts) if ts.isEmpty => n }
    val failedJson = failedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = mins.map(_._2).filter(_ >= 0).sum
    val totalWithFailedAtPrev: Option[Double] =
      if (failedQs.isEmpty) None
      else prior.map { case (_, prevMap) =>
        total + failedQs.flatMap(prevMap.get).filter(_ > 0).sum
      }
    // The driver's artifact keeps only the LAST ~2000 chars of stdout
    // (BENCH_r09.json: tail length exactly 2000, `parsed: null`), so the
    // line is laid out to degrade gracefully under tail-truncation: the
    // maps run min → max → MEDIAN, with the round-over-round signal
    // (medians, regressions, ann_recall) last so it survives whatever
    // budget the capture has. Times are ms-rounded (plan-cost
    // adjudication never needs sub-ms), and the COMPLETE line is also
    // written to BENCH_full_latest.json next to the prior-round
    // artifacts (best-effort — read-only trees just log).
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    // max/MEDIAN, not max/min: a single unusually-fast sample (fully
    // warm JVM, hot page cache) would inflate a min-based ratio on a
    // quiet box (measured 6.8 vs 1.5 on the same capture) — the
    // contention signal is how far the worst sample sits above the
    // typical one. Shared by BOTH sentinels.
    def inflationOf(samples: Seq[(Int, Double)]): Double = {
      val s = samples.map(_._2).sorted
      val med = median(s)
      if (med > 0) r3(s.last / med) else -1.0
    }
    // `samples` is the raw capture-order array of [queryPosition, seconds]
    // pairs (position = index of the next headline query): the stall-
    // correlation data the aggregate stats can't carry (VERDICT r17 #2).
    def sentinelJson(samples: Seq[(Int, Double)]): String = {
      val s = samples.map(_._2).sorted
      val arr = samples.map { case (p, t) => s"[$p,${r3(t)}]" }.mkString("[", ",", "]")
      s"""{"n":${s.size},"min":${r3(s.head)},""" +
        s""""median":${r3(median(s))},"max":${r3(s.last)},""" +
        s""""inflation":${inflationOf(samples)},"samples":$arr}"""
    }
    val calInflation = inflationOf(calSamples.toSeq)
    val latInflation = inflationOf(latSamples.toSeq)
    val memInflation = inflationOf(memSamples.toSeq)
    val calJson = sentinelJson(calSamples.toSeq)
    val latJson = sentinelJson(latSamples.toSeq)
    val memJson = sentinelJson(memSamples.toSeq)
    // Contamination gate (VERDICT r17 #1): when either sentinel's
    // max/median inflation exceeds the gate, the capture self-declares
    // contaminated — the tripwire in FUTURE runs skips it as a baseline,
    // and a reader sees the state up front instead of reverse-engineering
    // it from 12 phantom regressions (the r17 driver capture: latency
    // inflation 3.499, q_pagerank median 25.5 s vs 2.6-3.1 s clean).
    // 2.0 ≈ 2x the clean-capture reading (r17 closing board: 1.67/1.74).
    // Parsed defensively (ADVICE r18): a malformed env value must not
    // throw AFTER every query has run and lose the whole capture — fall
    // back to the default gate and say so.
    val sentinelGate = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_GATE", "2.0")
      scala.util.Try(raw.toDouble).getOrElse {
        System.err.println(s"[bench] SPARK_GRAFT_SENTINEL_GATE='$raw' is not " +
          "a number - using default gate 2.0")
        2.0
      }
    }
    val contaminated = calInflation > sentinelGate || latInflation > sentinelGate ||
      memInflation > sentinelGate
    if (contaminated)
      System.err.println(s"[bench] capture CONTAMINATED by its own sentinels " +
        s"(cal $calInflation, lat $latInflation, mem $memInflation, " +
        s"gate $sentinelGate) — tagged; " +
        "future tripwires will not use it as a baseline")
    val regressions: String = prior match {
      case None => "\"no_comparable_artifact\""
      case Some((src, prevMap)) =>
        regressionRows(meds, prevMap, src, calInflation, latInflation, memInflation)
          .mkString("[", ",", "]")
    }
    val estField = totalWithFailedAtPrev
      .map(v => s""","total_with_failed_at_prev":${r3(v)}""").getOrElse("")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(mins.map { case (k, v) => k -> r3(v) })},""" +
      s""""queries_max":${jmap(maxs.map { case (k, v) => k -> r3(v) })},""" +
      s""""queries_median":${jmap(meds.map { case (k, v) => k -> r3(v) })},""" +
      s""""failed":$failedJson$estField,"calibration":$calJson,""" +
      s""""calibration_latency":$latJson,"calibration_mem":$memJson,""" +
      s""""contaminated":$contaminated,"sentinel_gate":$sentinelGate,""" +
      s""""regressions":$regressions,"runs":$runs,"hermetic":true,"sf":"$sfDir"$annRecall}"""
    // Artifact files (VERDICT r17 #1 — baseline-publication discipline):
    //   - A SUBSET run (SPARK_GRAFT_BENCH_ONLY) writes BENCH_subset_latest
    //     .json only: an isolation probe must never shadow the full board
    //     (r17: a 3-query probe overwrote BENCH_full_latest.json).
    //   - A full run always writes BENCH_full_latest.json (the "what
    //     happened last" record, contamination tag included).
    //   - A full CLEAN run additionally publishes the per-sf clean
    //     baseline BENCH_full_clean_<sf>.json — the file the tripwire
    //     trusts most and the only one a contaminated capture can't touch.
    def writeArtifact(name: String): Unit =
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(benchDir, name), line)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name write skipped: ${e.getMessage}")
      }
    if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) writeArtifact("BENCH_subset_latest.json")
    else {
      writeArtifact("BENCH_full_latest.json")
      if (!contaminated) writeArtifact(s"BENCH_full_clean_$sfBase.json")
    }
    println(line)
    spark.stop()
  }
}
