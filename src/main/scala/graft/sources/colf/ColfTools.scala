package graft.sources.colf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI parity layer for the reference's three entry points (SURVEY.md §3):
  *
  *   csv_to_custom <in.csv> <out_dir>       (writer.py:215-228, E1)
  *   custom_to_csv <in_dir_or_file> <out.csv> (reader.py:223-263, E2)
  *   read_columns  <in_dir_or_file> <c1,c2>  (reader.py:264-274, E3)
  *
  * Differences from the reference, by design: output "files" are COLF
  * directories (the scale-out layout — a single `.colf` file is also
  * accepted on read), and zero-row tables round-trip (the reference's
  * writer crashes on them, writer.py:153-154). Null cells render as ""
  * on CSV export, like the reference (reader.py:259).
  */
object ColfTools {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("colf-tools")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = args match {
    case Array("csv_to_custom", in, out) =>
      ColfInference.readCsv(spark, in).write.format("colf").mode("overwrite").save(out)

    case Array("custom_to_csv", in, out) =>
      writeSingleCsv(spark.read.format("colf").load(in), out)

    case Array("stats", in) =>
      // header-only inspection (no data blocks read): rows + per-column
      // min/max/null-count — what the scanner's file pruning sees
      val conf = ColfUtil.driverHadoopConf()
      val refs = ColfUtil.resolveFileRefs(Seq(in), conf)
      var totalRows = 0L
      refs.foreach { r =>
        val h = ColfHeaderCache.get(r, conf)
        totalRows += h.schema.numRows
        println(s"${r.path}: rows=${h.schema.numRows} bytes=${r.size}")
        h.schema.fields.foreach { f =>
          val st = h.schema.stats.get(f.name)
          val bounds = st.map(s =>
            s"nulls=${s.nullCount} min=${s.min.getOrElse("-")} max=${s.max.getOrElse("-")}")
            .getOrElse("(no stats)")
          println(s"  ${f.name} ${f.tpe.name} $bounds")
        }
      }
      println(s"total: ${refs.length} files, $totalRows rows")

    case Array("compact", dir) =>
      val (b, a) = ColfMaintenance.compact(spark, dir)
      println(s"compacted $dir: $b files -> $a files")

    case Array("compact", dir, targetMb) =>
      val (b, a) = ColfMaintenance.compact(spark, dir, targetMb.toLong * 1024 * 1024)
      println(s"compacted $dir: $b files -> $a files")

    case Array("compact", dir, targetMb, sortCols) =>
      val (b, a) = ColfMaintenance.compact(spark, dir, targetMb.toLong * 1024 * 1024,
        sortCols.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      println(s"compacted $dir (sorted by $sortCols): $b files -> $a files")

    case Array("vacuum", dir) =>
      val (seen, deleted) = ColfMaintenance.vacuum(spark, dir)
      println(s"vacuumed $dir: $deleted of $seen orphaned temps removed")

    case Array("vacuum", dir, graceMinutes) =>
      val (seen, deleted) =
        ColfMaintenance.vacuum(spark, dir, graceMinutes.toLong * 60 * 1000)
      println(s"vacuumed $dir: $deleted of $seen orphaned temps removed")

    case Array("enable_versioning", dir) =>
      val v = ColfMaintenance.enableVersioning(spark, dir)
      println(s"versioning enabled on $dir at version $v")

    case Array("versions", dir) =>
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val vs = ColfVersions.listVersions(fs, root)
      if (vs.isEmpty) println(s"$dir is not versioned")
      else vs.foreach { v =>
        val es = ColfVersions.read(fs, root, v)
        println(s"v$v: ${es.length} files, ${es.map(_.size).sum} bytes")
      }

    case Array("vacuum_versions", dir) =>
      val (files, vers) = ColfMaintenance.vacuumVersions(spark, dir)
      println(s"vacuumed $dir: $files unreferenced data files, $vers old versions removed")

    case Array("vacuum_versions", dir, retain) =>
      val (files, vers) = ColfMaintenance.vacuumVersions(spark, dir, retain.toInt)
      println(s"vacuumed $dir: $files unreferenced data files, $vers old versions removed")

    case Array("vacuum_versions", dir, retain, graceMinutes) =>
      val (files, vers) = ColfMaintenance.vacuumVersions(spark, dir, retain.toInt,
        graceMinutes.toLong * 60 * 1000)
      println(s"vacuumed $dir: $files unreferenced data files, $vers old versions removed")

    case Array("merge", target, updates, keys) =>
      val (ins, repl) = merge(spark, target, updates,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      println(s"merged $updates into $target: $repl rows replaced, $ins inserted")

    case Array("merge", target, updates, keys, fmt) =>
      val (ins, repl) = merge(spark, target, updates,
        keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq, fmt)
      println(s"merged $updates into $target: $repl rows replaced, $ins inserted")

    case Array("read_columns", in, cols) =>
      val df = spark.read.format("colf").load(in)
        .select(cols.split(",").map(_.trim).map(org.apache.spark.sql.functions.col): _*)
      // reference prints CSV to stdout (reader.py:268-274); stream, don't
      // collect. SCALE CEILING: toLocalIterator funnels every row through
      // the driver — right for this stdout CLI parity tool, wrong for any
      // job-sized export (use df.write.csv, which stays distributed).
      println(df.columns.mkString(","))
      df.toLocalIterator().forEachRemaining { row =>
        println(df.columns.indices.map { i =>
          val v = row.get(i)
          if (v == null) "" else csvQuote(v.toString)
        }.mkString(","))
      }

    case other =>
      System.err.println(
        s"""Unknown arguments: ${other.mkString(" ")}
           |Usage:
           |  csv_to_custom <in.csv> <out_dir>
           |  custom_to_csv <in_dir_or_file> <out.csv>
           |  read_columns  <in_dir_or_file> <col1,col2,...>
           |  stats         <in_dir_or_file>
           |  compact       <dir> [targetMB [sortCol1,sortCol2]]
           |  vacuum        <dir> [graceMinutes]
           |  enable_versioning <dir>
           |  versions      <dir>
           |  vacuum_versions <dir> [retainLast [graceMinutes]]
           |  merge         <target_dir> <updates_path> <key1,key2,...> [updates_format=colf]""".stripMargin)
      sys.exit(2)
  }

  /** MERGE/upsert without Scala: same-key update rows replace target
    * rows, new keys insert — [[graft.operators.Upsert]] reachable from
    * the CLI (and from SQL users via `spark-submit --class ...ColfTools
    * merge`). Returns (inserted, replaced) row counts.
    *
    * On a PARTITIONED target this is the partition-scoped restatement
    * primitive: only partitions PRESENT IN THE UPDATES are rewritten —
    * the merged rows of touched partitions go through dynamic partition
    * overwrite, and the other partitions' files are never read, moved,
    * or rewritten (at 100 TB, "re-merge one day" must not touch the
    * other 99%). Constraint, standard for partition-scoped MERGE: a
    * key's partition values must not change across the merge (put the
    * partition columns in the key, or keep them stable) — a key that
    * "moved" partitions would leave its old row behind in an untouched
    * partition.
    *
    * On an unpartitioned target the whole table is restated through the
    * writer's crash-safe overwrite (old files are retained until commit
    * by the deferred truncate — and forever, under versioning — so the
    * self-read-then-overwrite is safe).
    */
  def merge(spark: SparkSession, targetDir: String, updatesPath: String,
      keys: Seq[String], updatesFormat: String = "colf"): (Long, Long) = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "colf merge: need at least one key column")
    val target = spark.read.format("colf").load(targetDir)
    val raw = updatesFormat match {
      case "csv"  => spark.read.option("header", "true").csv(updatesPath)
      case other  => spark.read.format(other).load(updatesPath)
    }
    raw.columns.toSeq.foreach { c =>
      require(target.columns.contains(c),
        s"colf merge: update column '$c' not in target schema ${target.columns.mkString(", ")}")
    }
    // align updates to the target's column order and types
    val updates = raw.select(target.schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val nUpdates = updates.count()
    val replaced = updates.join(target, keys, "left_semi").count()

    val partCols = ColfPartitions.partitionCols(
      ColfUtil.resolveFileRefs(Seq(targetDir), ColfUtil.driverHadoopConf()))
    // Partition-scoped merge is only sound when no key CHANGED partition
    // values — a moved key's old row lives in a partition the updates
    // never touch and would silently survive as a duplicate. Detect moves
    // with a key-join over just (keys ++ partCols) — a column-pruned scan,
    // cheap next to the merge itself — and route moved-key batches through
    // the full-table upsert, which restates every partition and cannot
    // strand old rows.
    val keysMoved = partCols.nonEmpty && {
      val tKeyParts = target.select((keys ++ partCols).map(col): _*)
        .toDF(keys ++ partCols.map("__t_" + _): _*)
      !updates.select((keys ++ partCols).map(col): _*)
        .join(tKeyParts, keys)
        .where(partCols.map(c => !(col(c) <=> col("__t_" + c))).reduce(_ || _))
        .isEmpty
    }
    if (partCols.isEmpty || keysMoved) {
      val merged = graft.operators.Upsert(target, updates, keys)
      val w = merged.write.format("colf").mode("overwrite")
      (if (partCols.isEmpty) w
       else w.option("partitionBy", partCols.mkString(","))).save(targetDir)
    } else {
      // merge ONLY within the touched partitions; dynamic overwrite
      // then replaces exactly those
      val touched = updates.select(partCols.map(col): _*).distinct()
      val targetTouched = target.join(broadcast(touched), partCols.toSeq, "left_semi")
      val merged = graft.operators.Upsert(targetTouched, updates, keys)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val tbl = s"colf_merge_$tag"
      val view = s"colf_merge_src_$tag"
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        spark.sql(s"CREATE TABLE $tbl USING colf OPTIONS (path '$targetDir', " +
          s"partitionBy '${partCols.mkString(",")}')")
        merged.createOrReplaceTempView(view)
        val order = spark.table(tbl).columns.map(c => s"`$c`").mkString(", ")
        spark.sql(s"INSERT OVERWRITE TABLE $tbl SELECT $order FROM $view")
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        spark.catalog.dropTempView(view)
      }
    }
    (nUpdates - replaced, replaced)
  }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Spark's CSV sink writes a directory; the reference CLI contract is a
    * single file — write to a scratch dir and move the lone part into
    * place. NULL → "" and "" stays "" (reader.py:259 parity); zero-row
    * frames still emit the header line (reader.py:239-251). All file
    * manipulation goes through the Hadoop FileSystem API so the CLI works
    * on any configured scheme (hdfs://, s3a://, ...), not just local
    * paths.
    */
  private[colf] def writeSingleCsv(df: DataFrame, out: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = out + ".colftools.tmp"
    df.coalesce(1).write
      .option("header", "true").option("nullValue", "").option("emptyValue", "\"\"")
      .mode("overwrite").csv(tmp)
    val tmpPath = new Path(tmp)
    val fs = tmpPath.getFileSystem(ColfUtil.driverHadoopConf())
    val part = fs.listStatus(tmpPath).toSeq
      .map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no csv part produced under $tmp"))
    val target = new Path(out)
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"colf custom_to_csv: rename $part -> $target failed")
    fs.delete(tmpPath, true)
  }
}
