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

  // ------------------------------------------------------ DDL sequences
  //
  // Random CREATE → {INSERT | ADD COLUMN | DROP COLUMN}* sequences
  // against an in-memory model: after every step the table must read
  // back exactly the model's rows under the model's current column set
  // (added columns null for pre-existing rows, dropped columns gone),
  // no ALTER may touch a data file, and every intermediate version's
  // DECLARED SCHEMA must still resolve via VERSION AS OF — schema time
  // travel, fuzzed.

  private sealed trait DdlOp
  private case class Insert(n: Int) extends DdlOp
  private case object AddCol extends DdlOp
  private case object DropCol extends DdlOp
  private case object RenameCol extends DdlOp

  private val genDdlOps: Gen[List[DdlOp]] =
    Gen.listOfN(8, Gen.frequency(
      (4, Gen.choose(1, 25).map(Insert)),
      (2, Gen.const(AddCol)),
      (2, Gen.const(DropCol)),
      (2, Gen.const(RenameCol))))

  // fresh-name pool with fixed types (resurrection refusal is pinned in
  // ColfDdlSpec; the fuzz exercises commit machinery with clean names)
  private val colPool: Seq[(String, DataType)] = Seq(
    "c1" -> IntegerType, "c2" -> DoubleType, "c3" -> StringType,
    "c4" -> IntegerType, "c5" -> DoubleType, "c6" -> StringType)

  private def valueFor(tpe: DataType, key: Int): Any = tpe match {
    case IntegerType => if (key % 7 == 0) null else Int.box(key % 13 - 2)
    case DoubleType  => if (key % 5 == 0) null else Double.box((key % 11) * 0.5 - 2.0)
    case StringType  => if (key % 6 == 0) null else Seq("x", "yy", "日本語", "")(key % 4)
    case other       => sys.error(s"unexpected $other")
  }

  private def ddlDataFiles(dir: String): Set[String] = {
    def walk(d: java.io.File): Seq[String] = {
      val es = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      es.filter(f => f.isFile && f.getName.endsWith(".colf") && !f.getName.startsWith("."))
        .map(f => s"${f.getName}@${f.lastModified()}") ++
        es.filter(f => f.isDirectory && f.getName.contains('=')).flatMap(walk)
    }
    walk(new java.io.File(dir)).toSet
  }

  property("random DDL sequence == model; ALTER touches no data file; schema time-travels") =
    forAllNoShrink(genDdlOps) { ops =>
      val s = spark
      s.conf.set("spark.sql.catalog.colf_fuzz",
        classOf[graft.sources.colf.ColfCatalog].getName)
      val dir = Files.createTempDirectory("colf_ddl_fuzz").toString + "/t"
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(s.sessionState.newHadoopConf())
      import scala.jdk.CollectionConverters._

      s.sql(s"CREATE TABLE colf_fuzz.`$dir` (k INT, p INT) PARTITIONED BY (p)")
      // model state: the FULL declared column order (ADD COLUMN appends at
      // the end, after the partition column — same convention as
      // Iceberg/Delta) + rows
      var declared = Vector[(String, DataType)](
        "k" -> IntegerType, "p" -> IntegerType)
      var pool = colPool
      val model = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
      var key = 0
      // version → declared field names, for the time-travel sweep
      val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
      def snap(): Unit = graft.sources.colf.ColfVersions.latestVersion(fs, root)
        .foreach(v => history += v -> declared.map(_._1))
      snap()

      var ok = true
      ops.foreach {
        case Insert(n) =>
          val rows = (0 until n).map { _ =>
            val m = declared.map { case (c, t) => c -> valueFor(t, key) }.toMap ++
              Map[String, Any]("p" -> Int.box(key % 2), "k" -> Int.box(key))
            key += 1
            m
          }
          model ++= rows
          val schema = StructType(declared.map { case (c, t) =>
            StructField(c, t, nullable = c != "k" && c != "p") })
          val df = s.createDataFrame(
            rows.map(m => Row.fromSeq(schema.fieldNames.toSeq.map(m(_)))).asJava, schema)
          df.writeTo(s"colf_fuzz.`$dir`").append()
          snap()
        case AddCol if pool.nonEmpty =>
          val (name, tpe) = pool.head
          pool = pool.tail
          val before = ddlDataFiles(dir)
          val sqlType = tpe match {
            case IntegerType => "INT"; case DoubleType => "DOUBLE"; case _ => "STRING" }
          s.sql(s"ALTER TABLE colf_fuzz.`$dir` ADD COLUMN $name $sqlType")
          ok &= ddlDataFiles(dir) == before
          declared :+= (name -> tpe)
          model.indices.foreach(i => model(i) = model(i) + (name -> null))
          snap()
        case DropCol if declared.exists(c => c._1 != "k" && c._1 != "p") =>
          val droppable = declared.collect {
            case (c, _) if c != "k" && c != "p" => c }
          val victim = droppable(key % droppable.length)
          val before = ddlDataFiles(dir)
          s.sql(s"ALTER TABLE colf_fuzz.`$dir` DROP COLUMN $victim")
          ok &= ddlDataFiles(dir) == before
          declared = declared.filterNot(_._1 == victim)
          model.indices.foreach(i => model(i) = model(i) - victim)
          snap()
        case RenameCol if declared.exists(c => c._1 != "k" && c._1 != "p") =>
          val renameable = declared.collect {
            case (c, _) if c != "k" && c != "p" => c }
          val victim = renameable(key % renameable.length)
          val to = victim + "r" // fresh logical name, physical slot unchanged
          val before = ddlDataFiles(dir)
          s.sql(s"ALTER TABLE colf_fuzz.`$dir` RENAME COLUMN $victim TO $to")
          ok &= ddlDataFiles(dir) == before
          declared = declared.map { case (c, t) =>
            if (c == victim) (to, t) else (c, t) }
          model.indices.foreach { i =>
            val m = model(i)
            model(i) = m - victim + (to -> m(victim))
          }
          snap()
        case _ => () // AddCol with drained pool / Drop/Rename with none left: skip
      }

      // final read == model under the current declared column set
      val order = declared.map(_._1)
      val got = s.sql(s"SELECT * FROM colf_fuzz.`$dir`")
      ok &= got.schema.fieldNames.toSeq == order
      val modelSchema = StructType(declared.map { case (c, t) =>
        StructField(c, t, nullable = true) })
      val ref = s.createDataFrame(
        model.map(m => Row.fromSeq(order.map(m(_)))).toSeq.asJava, modelSchema)
      val contentOk = canon(got, order) == canon(ref, order)
      if (!contentOk) println(s"DDL FUZZ MISMATCH ops=$ops")
      // every recorded version still resolves its OWN declared schema
      val travelOk = history.forall { case (v, cols) =>
        s.sql(s"SELECT * FROM colf_fuzz.`$dir` VERSION AS OF $v")
          .schema.fieldNames.toSeq == cols
      }
      if (!travelOk) println(s"DDL FUZZ TIME-TRAVEL SCHEMA MISMATCH ops=$ops")
      ok && contentOk && travelOk
    }
}
