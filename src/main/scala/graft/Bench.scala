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
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    /** Repeat each query and report (MIN, MAX): the min is the best
      * estimate of plan cost under machine noise (any slower run was
      * contention, GC, or page-cache misses — the r2 AND r3 driver records
      * were both inflated by exactly that), and carrying the max alongside
      * makes a contention-skewed capture self-evident IN the artifact — a
      * max/min ratio far above ~2 says the machine was busy, no re-run
      * needed to diagnose it. Failures short-circuit as (-1, -1).
      */
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    def run(name: String): (Double, Double) = {
      var best = Double.MaxValue
      var worst = 0.0
      var i = 0
      while (i < runs) {
        val t = runOnce(name)
        if (t < 0) return (-1.0, -1.0)
        if (t < best) best = t
        if (t > worst) worst = t
        i += 1
      }
      (best, worst)
    }

    // One warmup pass on a tiny sf to JIT-compile codegen'd pipelines and
    // warm file-system metadata, so measured numbers reflect steady state.
    // Failures are LOGGED (a missing warmup dir silently skewing headline
    // numbers was ADVICE r2) but don't fail the bench.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (!new java.io.File(warmDir).isDirectory)
      System.err.println(s"[bench] warmup dir $warmDir missing — first-query JIT cost " +
        "will land in the measured numbers (set SPARK_GRAFT_WARM_DIR)")
    Headline.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }

    val results = Headline.map(n => n -> run(n))

    // ANN quality trend: recall@10 of each approximate strategy against the
    // exact brute-force top-k over the same corpus and a 64-query probe set
    // — the rows-only similarity queries carry a quantitative quality
    // number the driver can trend round-over-round, not just a runtime.
    val annRecall: String = try {
      import org.apache.spark.sql.functions.col
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val probes = emb.where(col("id") < 64)
      val k = 10
      val exact = Similarity.bruteForceTopK(emb, probes, k)
        .select("query_id", "nbr_id").cache()
      val denom = exact.count().toDouble
      def recall(approx: org.apache.spark.sql.DataFrame): Double = {
        val hits = exact.join(approx.select("query_id", "nbr_id"),
          Seq("query_id", "nbr_id")).count()
        math.round(hits / denom * 10000) / 10000.0
      }
      // Each strategy at its harness default AND a high-recall setting, so
      // the artifact shows the recall/cost knob, not one point on it:
      // fewer LSH planes = bigger buckets; more IVF probes; deeper PQ
      // refine. Synthetic embeddings are near-isotropic (weak neighbor
      // structure), so defaults sit low by construction — the *_hi deltas
      // are what demonstrate the tradeoff works.
      val lsh = recall(Similarity.lshTopK(emb, probes, k))
      val lshHi = recall(Similarity.lshTopK(emb, probes, k, planes = 4))
      val lshMt = recall(Similarity.lshTopK(emb, probes, k, tables = 4))
      val ivf = recall(Similarity.ivfTopK(emb, probes, k))
      val ivfHi = recall(Similarity.ivfTopK(emb, probes, k, nProbe = 8))
      val pq = recall(Similarity.pqTopK(emb, probes, k, m = 8, bits = 6, refine = 8))
      val pqHi = recall(Similarity.pqTopK(emb, probes, k, m = 8, bits = 6, refine = 32))
      exact.unpersist()
      s""","ann_recall":{"k":$k,"probes":64,"lsh":$lsh,"lsh_hi":$lshHi,"lsh_mt4":$lshMt,""" +
        s""""ivf":$ivf,"ivf_hi":$ivfHi,"pq":$pq,"pq_hi":$pqHi}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ann recall failed: ${e.getMessage}"); ""
    }

    // `queries` stays the min map (what the harness reads as the signal);
    // `queries_max` carries the worst run for the integrity check above.
    val qs = results.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }.mkString("{", ",", "}")
    val qsMax = results.map { case (k, (_, mx)) => "\"" + k + "\":" + mx }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_max":$qsMax,"runs":$runs,"sf":"$sfDir"$annRecall}""")
    spark.stop()
  }
}
