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
      // Inner-plan capture (r21, VERDICT r20 #4): sealed-result queries
      // explain as a bare checkpoint leaf and sink writes as the
      // post-write read-back, hiding the exchanges the optimizations
      // insert. While the query builds, CacheScope.materialize and the
      // write helpers hand every inner plan here; the first 8 per query
      // land as <name>_<suffix>.<kind><i>.txt next to the final plan.
      val captured = new java.util.concurrent.atomic.AtomicInteger(0)
      operators.PlanCapture.sink = Some { (kind, txt) =>
        val i = captured.incrementAndGet()
        if (i <= 8)
          Files.writeString(Paths.get(outDir, s"${n}_$suffix.$kind$i.txt"), txt)
      }
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        spark.sharedState.cacheManager.clearCache()
        System.err.println(s"[plandump] $n ok (${captured.get()} inner plans)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
        spark.sharedState.cacheManager.clearCache()
      } finally operators.PlanCapture.sink = None
    }
    spark.stop()
  }
}
