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
    "q_window", "q_topk", "q_events_window",
    "q_colf_scan_full", "q_colf_project", "q_colf_agg",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
    "q_sim_bruteforce", "q_sim_ann", "q_sim_ivf",
    "q_text_stats", "q_quality_score", "q_word_freq", "q_sessionize",
    "q_curation_pipeline",
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

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // One warmup pass on a tiny sf to JIT-compile codegen'd pipelines and
    // warm file-system metadata, so measured numbers reflect steady state.
    val warmDir = "/root/testdata/sf0.001"
    Headline.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    val results = Headline.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
