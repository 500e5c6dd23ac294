package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("globalCumsum equals the single-partition window cumsum") {
    val df = (1 to 997).map(i => (i.toLong, (i * 7 % 23) + 1)).toDF("id", "v")
    val naive = df.withColumn("cum",
        sum($"v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val dist = Packing.globalCumsum(df, $"id", $"v", numPartitions = 7)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(dist == naive)
  }

  test("globalCumsum is invariant to input partitioning") {
    val df = (1 to 500).map(i => (i.toLong, i % 13 + 1)).toDF("id", "v")
    val a = Packing.globalCumsum(df.repartition(1), $"id", $"v", numPartitions = 3)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val b = Packing.globalCumsum(df.repartition(11), $"id", $"v", numPartitions = 8)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("packTokenStream: docs span pack boundaries with exact offsets") {
    // token counts 4, 5, 3, 8 at budget 10:
    //   doc 1 -> [0,4)   pack 0 offset 0, 4 tokens
    //   doc 2 -> [4,9)   pack 0 offset 4, 5 tokens
    //   doc 3 -> [9,12)  pack 0 offset 9 (1 token) + pack 1 offset 0 (2)
    //   doc 4 -> [12,20) pack 1 offset 2, 8 tokens
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b c"),
      (4L, "a b c d e f g h"), (5L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val got = Packing.packTokenStream(docs, $"doc_id", $"text", budget = 10)
      .orderBy("id", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L),
      (2L, 0L, 4L, 5L),
      (3L, 0L, 9L, 1L), (3L, 1L, 0L, 2L),
      (4L, 1L, 2L, 8L)))
    // every pack except the last is exactly full
    val byPack = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(byPack == Map(0L -> 10L, 1L -> 10L))
  }

  test("packing conserves tokens and never overfills a pack") {
    val docs = (0 until 2000)
      .map(i => (i.toLong, ("tok " * (i % 37 + 1)).trim)).toDF("doc_id", "text")
    val packed = Packing.packTokenStream(docs, $"doc_id", $"text", budget = 64,
      numPartitions = 9)
    val total = packed.agg(sum("n_in_pack")).as[Long].head()
    val expected = docs.select(sum(size(split($"text", " ")))).as[Long].head()
    assert(total == expected)
    val perPack = packed.groupBy("pack_id").agg(sum("n_in_pack").as("n"))
    assert(perPack.where($"n" > 64).isEmpty)
    // all but the final pack are exactly full
    assert(perPack.where($"n" =!= 64).count() <= 1)
    // fragments reassemble each doc: offsets partition [0, n_tokens)
    val frag = packed.groupBy("id").agg(sum("n_in_pack").as("s"), max("n_tokens").as("n"))
    assert(frag.where($"s" =!= $"n").isEmpty)
  }
}
