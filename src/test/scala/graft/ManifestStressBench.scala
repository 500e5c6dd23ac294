package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.colf.{ColfColStats, ColfField, ColfType, ColfVersions}

/** Micro-bench behind the sharded-manifest O(delta) claim (SURVEY §8):
  * a 10⁵-file table, 50 single-file append commits + reads, sharded
  * (production defaults) vs inline (the pre-sharding format, forced by
  * raising InlineMaxEntries past the table size). No Spark session, no
  * data files — this isolates manifest render/publish/parse, which is
  * exactly what a 1000-executor driver pays per commit and per plan.
  *
  * Run: sbt "Test/runMain graft.ManifestStressBench [nFiles]"
  */
object ManifestStressBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val schema = Seq(
      ColfField("id", ColfType.Int32, nullable = false),
      ColfField("score", ColfType.Float64, nullable = true),
      ColfField("text", ColfType.Utf8, nullable = true))
    def entry(i: Int): ColfVersions.Entry = ColfVersions.Entry(
      f"part-$i%07d.colf", 1L << 20, 1700000000000L + i, schema,
      numRows = 10000L,
      stats = Map(
        "id" -> ColfColStats(0L, Some(i * 10000), Some(i * 10000 + 9999)),
        "score" -> ColfColStats(5L, Some(0.0), Some(1.0))))

    val conf = new Configuration()
    val commits = 50

    def run(mode: String): Unit = {
      val inlineCap = ColfVersions.InlineMaxEntries
      if (mode == "inline") ColfVersions.InlineMaxEntries = Int.MaxValue
      try {
        val dir = Files.createTempDirectory(s"manifest_stress_$mode").toString
        val root = new Path(dir)
        val fs = root.getFileSystem(conf)
        // seed: one commit carrying all n entries (bulk load / adoption)
        val t0 = System.nanoTime()
        ColfVersions.append(fs, root, _ => (0 until n).map(entry))
        val seedMs = (System.nanoTime() - t0) / 1e6
        // steady state: 50 commits each appending ONE file
        val t1 = System.nanoTime()
        (0 until commits).foreach { c =>
          ColfVersions.append(fs, root, basis =>
            basis.map(_._2).getOrElse(Seq.empty) :+ entry(n + c))
        }
        val commitMs = (System.nanoTime() - t1) / 1e6 / commits
        // planning: first (cold-cache) read and steady-state (warm) read
        val t2 = System.nanoTime()
        val got = ColfVersions.latest(fs, root).get._2.length
        val coldMs = (System.nanoTime() - t2) / 1e6
        val t3 = System.nanoTime()
        ColfVersions.latest(fs, root).get._2.length
        val warmMs = (System.nanoTime() - t3) / 1e6
        // manifest-dir footprint after the 51 commits
        val bytes = fs.listStatus(new Path(root, ColfVersions.VersionsDir))
          .map(_.getLen).sum
        require(got == n + commits, s"$mode: expected ${n + commits} entries, got $got")
        println(f"$mode%-8s seed=${seedMs}%9.1fms  commit=${commitMs}%8.2fms/commit  " +
          f"readCold=${coldMs}%8.1fms  readWarm=${warmMs}%7.1fms  dir=${bytes / 1048576.0}%6.1fMiB")
      } finally ColfVersions.InlineMaxEntries = inlineCap
    }

    println(s"n=$n files, $commits single-file commits, schema=3 cols with stats")
    run("sharded")
    run("inline")
  }
}
