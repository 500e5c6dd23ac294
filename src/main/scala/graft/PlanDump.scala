package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement aid (optimization rounds): write `.explain("formatted")`
  * for headline queries to <outDir>/<name>_<suffix>.txt so plan claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema, codegen
  * spans) are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q_a,q_b,...]
  *
  * Building a query's DataFrame can itself run jobs (streaming queries
  * drain their stream; ANN planners count the corpus) — that is the
  * declared shape of those queries, and the dump tolerates per-query
  * failure loudly rather than aborting the sweep.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args.lift(2).getOrElse("before")
    val only: Option[Set[String]] = args.lift(3).map(_.split(',').map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = Bench.Headline.filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        spark.sharedState.cacheManager.clearCache()
        System.err.println(s"[plandump] $n ok")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
