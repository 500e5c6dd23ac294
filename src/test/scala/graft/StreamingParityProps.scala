package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.operators.Sampling
import graft.streaming.StreamingOps

/** Randomized batch-parity sweep for the stateful streaming operators:
  * on random event logs cut into random microbatch prefixes, the
  * streaming funnel and the streaming rate cap must equal their batch
  * counterparts exactly — the parity the hand-case specs pin, now under
  * arbitrary arrival orders and batch boundaries. Event times stay
  * strictly above 0 (an event at the initial watermark is dropped by
  * Spark's late-row filter — pinned in StreamingRateCapSpec) and each
  * batch's events arrive in shuffled order while the cross-batch split
  * respects event time (the watermark contract the operators document:
  * late data is best-effort, so the property generates none).
  */
object StreamingParityProps extends Properties("StreamingParity") {

  // each case runs a real streaming query — few, adversarial cases
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    PropsConfig.soundness(p, 5)

  private lazy val spark = SparkTest.session

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  private case class Ev(k: Long, et: String, ms: Long, eid: Long)

  /** Random log with colliding timestamps, split into watermark-ordered
    * batches (every event of batch i precedes every event of batch i+1
    * in event time), shuffled within each batch.
    */
  private val genBatches: Gen[List[List[Ev]]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L)
      et <- Gen.oneOf("a", "b", "c")
      ms <- Gen.choose(1L, 400L)
    } yield (k, et, ms))
    cuts <- Gen.choose(1, 3)
    shuffleSeed <- Gen.choose(0L, 1000L)
  } yield {
    val evs = rows.zipWithIndex.map { case ((k, et, ms), i) => Ev(k, et, ms, i.toLong) }
      .sortBy(e => (e.ms, e.eid))
    val perBatch = math.max(1, evs.size / cuts)
    val rnd = new scala.util.Random(shuffleSeed)
    // cut only at STRICT time boundaries: a 0-delay watermark advances to
    // batch i's max event time, and Spark's late filter drops eventTime
    // <= watermark — an equal-ms group straddling a cut would have its
    // later half dropped as late, which is a property of the generator,
    // not of the operators under test (first seen as a real falsifying
    // case: ms=84 split across batches 1 and 2)
    val byMs = evs.groupBy(_.ms).toList.sortBy(_._1).map(_._2)
    val batches = scala.collection.mutable.ListBuffer[List[Ev]]()
    var cur = List.empty[Ev]
    byMs.foreach { g =>
      if (cur.size >= perBatch && batches.size < cuts - 1) {
        batches += cur; cur = List.empty
      }
      cur = cur ++ g
    }
    if (cur.nonEmpty) batches += cur
    batches.toList.map(b => rnd.shuffle(b))
  }

  private def runStream(batches: List[List[Ev]])(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)(
      read: String => Set[Any]): Set[Any] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp, Long, Long)]
    val df = mem.toDS().toDF("k", "et", "t", "us", "eid").withWatermark("t", "0 seconds")
    val qname = s"parity_${System.nanoTime()}"
    val q = build(df).writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map(e => (e.k, e.et, ts(e.ms), e.ms * 1000L, e.eid)))
        q.processAllAvailable()
      }
      mem.addData((-1L, "a", ts(10000000L), 10000000L * 1000L, -1L))
      q.processAllAvailable()
      mem.addData((-1L, "a", ts(20000000L), 20000000L * 1000L, -2L))
      q.processAllAvailable()
      read(qname)
    } finally q.stop()
  }

  property("funnelStream == batch funnel on random multi-batch logs") =
    forAllNoShrink(genBatches) { batches =>
      import spark.implicits._
      val steps = Seq("a", "b", "c")
      val got = runStream(batches) { df =>
        StreamingOps.funnelStream(df, "k", "et", "t", "us", steps)
      } { qname =>
        spark.table(qname).where(col("user_id") >= 0)
          .groupBy("user_id").agg(max("deepest").as("d")).collect()
          .map(r => (r.getLong(0), r.getInt(1)): Any).toSet
      }
      // batch reference: per-user deepest in-order step from the funnel
      // frontiers (funnel() aggregates counts, so recompute depth per user)
      val all = batches.flatten
      val expected: Set[Any] = all.groupBy(_.k).flatMap { case (k, es) =>
        val sorted = es.sortBy(e => (e.ms * 1000L, e.eid))
        var frontier = List.fill(steps.length)(Long.MaxValue)
        sorted.foreach { e =>
          val i = steps.indexOf(e.et)
          val tus = e.ms * 1000L
          val prevOk = i == 0 || (frontier(i - 1) != Long.MaxValue && tus > frontier(i - 1))
          if (i >= 0 && prevOk && tus < frontier(i))
            frontier = frontier.updated(i, tus)
        }
        val depth = frontier.takeWhile(_ != Long.MaxValue).length
        if (depth > 0) Some((k, depth): Any) else None
      }.toSet
      got == expected
    }

  property("scd2Stream (drained) == batch scd2 on random multi-batch logs") =
    forAllNoShrink(genBatches) { batches =>
      import spark.implicits._
      // horizon far beyond any generated gap → exact batch parity
      val got = runStream(batches) { df =>
        StreamingOps.scd2Stream(df, "k", "t", "us", "eid", Seq("et"),
          closeHorizonMicros = 3600L * 1000000L)
      } { qname =>
        spark.table(qname).where(col("k") >= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
            r.getString(4)): Any).toSet
      }
      val all = batches.flatten
      val ref = graft.operators.Analytics.scd2(
          all.map(e => (e.k, e.et, e.ms * 1000L, e.eid)).toDF("k", "et", "tus", "eid"),
          col("k"), col("tus"), col("eid"), Seq("et" -> col("et")))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
          r.getString(4)): Any).toSet
      got == ref
    }

  property("rateCapStream == capPerKeyWindow on random multi-batch logs") =
    forAllNoShrink(genBatches, Gen.choose(1L, 200000L), Gen.choose(1, 3)) {
      (batches, windowUs, n) =>
      import spark.implicits._
      val got = runStream(batches) { df =>
        StreamingOps.rateCapStream(df, "k", "t", "us", "eid", windowUs, n)
      } { qname =>
        spark.table(qname).where(col("k") >= 0)
          .select("eid", "bucket", "rn").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)): Any).toSet
      }
      val all = batches.flatten
      val ref = Sampling.capPerKeyWindow(
          all.map(e => (e.k, e.ms * 1000L, e.eid)).toDF("k", "us", "eid"),
          col("k"), col("us"), col("eid"), windowUs, n)
        .select("eid", "bucket", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)): Any).toSet
      got == ref
    }
}
