package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamingOps

/** Micro-bench behind the tiered count-state claim (SURVEY §8 /
  * ROUND17 carry-over #3): per-batch merge cost of a SMALL,
  * bucket-concentrated delta (the workload the bucketed layout exists
  * for — a handful of hot keys against a big maintained table) as the
  * state grows, flat tier vs bucketed tier. Flat rewrites the whole
  * state per batch (O(state)); bucketed reads and rewrites only the
  * delta's buckets, so its per-batch cost must flatten as state grows.
  *
  * Run: sbt "Test/runMain graft.BucketStateBench [keysPerStep] [steps]"
  * Prints one JSON line per (tier, stateRows) cell.
  */
object BucketStateBench {

  def main(args: Array[String]): Unit = {
    val keysPerStep = args.headOption.map(_.toInt).getOrElse(500000)
    val steps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .appName("bucket-state-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def probe(tier: String, gate: Long): Unit = {
      val before = StreamingOps.BucketStateMinBytes
      StreamingOps.BucketStateMinBytes = gate
      try {
        val dir = java.nio.file.Files.createTempDirectory(s"bkt-bench-$tier").toString
        var batch = 0L
        var stateRows = 0L
        for (step <- 1 to steps) {
          // grow the state by keysPerStep fresh keys (bulk load batch)
          spark.range(stateRows, stateRows + keysPerStep)
            .selectExpr("id AS k", "1L AS dn")
            .createOrReplaceTempView("bulk")
          StreamingOps.mergeCountState(dir, Seq("k"),
            spark.table("bulk"), batch)
          batch += 1
          stateRows += keysPerStep
          // the measured workload: a 5-key delta (touches <=5 of 64
          // buckets), timed over 3 batches, median reported
          val times = (0 until 3).map { _ =>
            val d = (0 until 5).map(i => (stateRows - 1 - i * 7, 1L)).toDF("k", "dn")
            val t0 = System.nanoTime()
            StreamingOps.mergeCountState(dir, Seq("k"), d, batch)
            batch += 1
            (System.nanoTime() - t0) / 1e9
          }.sorted
          println(f"""{"tier":"$tier","state_rows":$stateRows,""" +
            f""""small_delta_merge_s":${times(1)}%.3f}""")
        }
      } finally StreamingOps.BucketStateMinBytes = before
    }

    probe("flat", Long.MaxValue) // gate never crossed: always flat
    probe("bucketed", 0L)        // gate at zero: buckets from batch 1
    spark.stop()
  }
}
