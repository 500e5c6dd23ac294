package graft.sources.colf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Directory maintenance for colf tables. The streaming sink emits one
  * part file per epoch per partition — exactly the small-file accretion
  * pattern that, left alone, turns a year-old table into 10⁶ tiny files
  * whose per-file open/seek overhead dwarfs the data. Compaction rewrites
  * the directory into files sized near the write-side rolling cap.
  */
object ColfMaintenance {

  /** Remove orphaned write temps (`.*-<queryId>-*.colf.tmp`) left by a
    * hard driver kill — the one crash the rename-first commit protocol
    * cannot self-clean (task/job abort handles every softer failure).
    * Temps are invisible to readers (dot-prefixed), so this is hygiene,
    * not correctness — but at 10⁵ part files a year of kill -9s is real
    * storage. `graceMs` protects IN-FLIGHT writes: a temp younger than
    * the grace window may belong to a running job and is left alone
    * (default 24 h — no sane single write runs longer). Returns
    * (tempsSeen, tempsDeleted). Idempotent; safe to run concurrently
    * with writers given an honest grace window.
    */
  def vacuum(spark: SparkSession, dir: String,
      graceMs: Long = 24L * 3600 * 1000): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return (0, 0)
    val cutoff = System.currentTimeMillis() - graceMs
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val (dirs, files) = fs.listStatus(p).toSeq.partition(_.isDirectory)
      files ++ dirs.flatMap(d => walk(d.getPath))
    }
    val temps = walk(root).filter { st =>
      val n = st.getPath.getName
      n.startsWith(".") && n.endsWith(".colf.tmp")
    }
    val stale = temps.filter(_.getModificationTime < cutoff)
    ColfHeaderCache.mapParallel(stale)(st => fs.delete(st.getPath, false))
    (temps.length, stale.length)
  }

  /** Rewrite `dir` into ~`targetBytes`-sized part files (compressed size
    * basis; the writer's own rolling caps still bound each file).
    *
    * Do NOT compact a directory a streaming SOURCE is tailing: the
    * compacted files are new names with new mtimes, so a tailing reader
    * would re-ingest the rewritten data (the source's append-only
    * contract, [[ColfMicroBatchStream]]). Compact downstream tables, or
    * pause the consumer across the rewrite.
    *
    * Concurrent-writer safe: the rewrite reads EXACTLY the files listed
    * up front (by explicit path, not a re-listing), so a file appended
    * mid-compaction is neither copied nor deleted — it simply waits for
    * the next compaction. Data is never LOST: new files land (append
    * mode, fresh query-id names) before any old file is deleted. The
    * remaining crash window is between write commit and the deletes: old
    * and new copies coexist then, and without a manifest a re-run cannot
    * tell them apart — DUPLICATE rows persist until one set is removed
    * (the new files share one query id, making manual repair
    * unambiguous). Accept that window or front a manifest-based table
    * format.
    *
    * @param sortBy optional re-clustering: the rewrite range-partitions +
    *               sorts on these columns (the writer's `sortBy` path), so
    *               compaction doubles as layout OPTIMIZE — compacted files
    *               get tight disjoint min/max stats and pruning starts
    *               biting on a table whose original write order had none.
    * @return (filesBefore, filesAfter)
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = ColfWrite.DefaultMaxBytesPerFile,
      sortBy: Seq[String] = Seq.empty): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = ColfUtil.driverHadoopConf()
    val before = ColfUtil.resolveFileRefs(Seq(dir), conf)
    if (before.lengthCompare(1) <= 0 && sortBy.isEmpty)
      return (before.length, before.length)

    val totalBytes = before.map(_.size).sum
    val nParts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // mergeSchema: a directory that evolved columns over time compacts to
    // the UNION schema (older rows null-extended). Without it the first
    // file's schema would silently drop later-added columns — and the
    // delete below would make that loss permanent. Type conflicts still
    // fail loudly before anything is written or deleted.
    val df = spark.read.format("colf").option("mergeSchema", "true")
      .load(before.map(_.path): _*)
    val writer =
      if (sortBy.nonEmpty)
        df.write.format("colf")
          .option("sortBy", sortBy.mkString(","))
          .option("numFiles", nParts)
      else df.coalesce(nParts).write.format("colf")
    writer.mode("append").save(dir)

    val fs = new Path(dir).getFileSystem(conf)
    before.foreach { r =>
      if (!fs.delete(new Path(r.path), false))
        throw new java.io.IOException(s"compact: failed to delete ${r.path}")
    }
    (before.length, ColfUtil.resolveFileRefs(Seq(dir), conf).length)
  }
}
