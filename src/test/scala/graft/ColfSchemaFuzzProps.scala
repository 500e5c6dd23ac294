package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** Randomized SCHEMA-EVOLUTION fuzz: a table written over time with
  * shifting column sets (the lakehouse reality — columns appear mid-life)
  * must read back under `mergeSchema` exactly like the union-schema rows
  * held in memory, including under filters whose column is ABSENT from
  * some files: those files' values are all-null there, so `b IS NULL`
  * must return their rows and stats pruning must never drop them.
  * Partitioned layout stays on throughout, so evolved data schemas
  * compose with `k=v` directory columns and per-file stats.
  */
object ColfSchemaFuzzProps extends Properties("ColfSchemaFuzz") {

  // each case writes a fresh 4-append evolved table (~2 s)
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    PropsConfig.soundness(p, 15)

  private lazy val spark: SparkSession = SparkTest.session

  private val fullSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("a", IntegerType, nullable = true),
    StructField("b", DoubleType, nullable = true),
    StructField("c", StringType, nullable = true),
    StructField("p", IntegerType, nullable = false)))

  private case class Step(cols: Set[String], rows: Int)

  private val genStep: Gen[Step] = for {
    sub <- Gen.someOf("a", "b", "c")
    n <- Gen.choose(1, 40)
  } yield Step(sub.toSet, n)

  private val genCase: Gen[List[Step]] = Gen.listOfN(4, genStep)

  /** Deterministic full-width row for key `key`; columns outside `cols`
    * are null — the SAME Row feeds the write (projected) and the model.
    */
  private def mkRow(key: Int, cols: Set[String]): Row = {
    def a: Integer = if (key % 7 == 0) null else Int.box(key % 13 - 2)
    def b: java.lang.Double = key % 5 match {
      case 0 => null
      case 1 => Double.NaN
      case 2 => -0.0
      case _ => Double.box((key % 11) * 0.5 - 2.0)
    }
    def c: String = if (key % 6 == 0) null else Seq("x", "yy", "日本語", "")(key % 4)
    Row(key, if (cols("a")) a else null, if (cols("b")) b else null,
      if (cols("c")) c else null, key % 2)
  }

  private def leafFilters(appeared: Set[String]): Seq[(org.apache.spark.sql.Column, String)] = {
    val base = Seq(
      (col("k") > 40, "k > 40"), (col("p") === 1, "p = 1"))
    val opt = Seq(
      "a" -> Seq((col("a").isNull, "a IS NULL"), (col("a") >= 3, "a >= 3")),
      "b" -> Seq((col("b").isNull, "b IS NULL"), (col("b") < 0.0, "b < 0"),
        (col("b") <=> -0.0, "b <=> -0.0")),
      "c" -> Seq((col("c").isNotNull, "c IS NOT NULL"), (col("c") === "yy", "c = 'yy'"),
        (col("c").startsWith("日"), "c LIKE '日%'")))
    base ++ opt.filter(o => appeared(o._1)).flatMap(_._2)
  }

  private def canon(df: DataFrame, order: Seq[String]): Seq[String] =
    df.select(order.map(col): _*).collect().toSeq.map { r =>
      (0 until r.length).map { i =>
        if (r.isNullAt(i)) "␀"
        else r.get(i) match {
          case d: Double => java.lang.Double.toString(d)
          case x         => x.toString
        }
      }.mkString("|")
    }.sorted

  property("evolved table under mergeSchema == union-schema rows, filtered or not") =
    forAllNoShrink(genCase) { steps =>
      val dir = Files.createTempDirectory("colf_schema_fuzz").toString
      var key = 0
      val model = scala.collection.mutable.ArrayBuffer.empty[Row]
      import scala.jdk.CollectionConverters._
      steps.foreach { st =>
        val rows = (0 until st.rows).map { _ => val r = mkRow(key, st.cols); key += 1; r }
        model ++= rows
        val writeCols = Seq("k") ++ Seq("a", "b", "c").filter(st.cols) ++ Seq("p")
        spark.createDataFrame(rows.asJava, fullSchema)
          .select(writeCols.map(col): _*)
          .write.format("colf").option("partitionBy", "p")
          .mode("append").save(dir)
      }
      val appeared = steps.flatMap(_.cols).toSet
      val order = Seq("k") ++ Seq("a", "b", "c").filter(appeared) ++ Seq("p")
      val colf = spark.read.format("colf").option("mergeSchema", "true").load(dir)
      val ref = spark.createDataFrame(model.asJava, fullSchema)

      val plainOk = canon(colf, order) == canon(ref, order)
      if (!plainOk) println(s"SCHEMA FUZZ MISMATCH (no filter) steps=$steps")
      // every leaf filter, including on columns absent from some files
      val filterOk = leafFilters(appeared).forall { case (f, d) =>
        val ok = canon(colf.where(f), order) == canon(ref.where(f), order)
        if (!ok) println(s"SCHEMA FUZZ MISMATCH [$d] steps=$steps")
        ok
      }
      plainOk && filterOk
    }
}
