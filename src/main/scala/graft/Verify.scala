package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (iteration aid;
    // the driver always runs the full set)
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Testdata contract preflight (VERDICT r9 #1): assert every table's
    // observed schema against the accepted flavor set and run the three
    // data-level probes (props-is-JSON, embedding-width uniformity,
    // exactly-gap session ties) BEFORE any query executes. Drift lands in
    // _contract.json immediately, on stderr, and in _errors.json under
    // `_contract:` keys — so a red correctness report carries its probable
    // cause next to the failures. Advisory-loud, never fatal: the queries
    // still run (adaptive paths may well survive the drift).
    try {
      val drifts = DataContract.check(spark, sfDir)
      val contractJson = drifts.map { d =>
        s"""{"table":${q(d.table)},"check":${q(d.check)},"detail":${q(d.detail)}}"""
      }.mkString("[", ",", "]")
      Files.writeString(Paths.get(s"$outDir/_contract.json"), contractJson)
      drifts.foreach { d =>
        System.err.println(s"[verify] CONTRACT DRIFT ${d.table}/${d.check}: ${d.detail}")
        errors(s"_contract:${d.table}:${d.check}") = d.detail.take(2000)
      }
      if (drifts.isEmpty)
        System.err.println(s"[verify] testdata contract holds for $sfDir")
    } catch { case e: Throwable =>
      val msg = Option(e.getMessage).getOrElse(e.toString).take(2000)
      System.err.println(s"[verify] contract check crashed: $msg")
      errors("_contract:crashed") = msg
      try Files.writeString(Paths.get(s"$outDir/_contract.json"),
        s"""[{"table":"_all","check":"crashed","detail":${q(msg)}}]""")
      catch { case _: Throwable => () }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.toString).take(2000)
        // A failed query must still be VISIBLE downstream: write a 1-row
        // sentinel result (a schema no oracle can match) so the name shows
        // up in the compare as an explicit mismatch carrying the error text
        // instead of silently vanishing from the correctness report.
        try {
          val msg = Option(e.getMessage).getOrElse(e.toString).take(500)
          spark.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row("ERROR", msg)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_graft_error",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("_message",
                org.apache.spark.sql.types.StringType))))
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // Machine-readable error roll-up alongside the per-query sentinels.
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
