package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression-tripwire's prior-artifact parsing against
  * both artifact shapes it meets in the wild: the raw one-line JSON
  * `graft.Bench` prints, and the driver's per-round wrapper whose `tail`
  * field is backslash-escaped AND truncated to the last ~2000 chars of
  * stdout (BENCH_r09.json is exactly that shape, with `parsed: null`).
  * A silent mis-parse here doesn't fail anything visibly — it just makes
  * the `regressions` field permanently empty, which defeats the
  * tripwire's purpose — so the parsing rules are worth their own spec.
  */
class BenchParseSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("raw bench line: medians preferred over the min map") {
    val raw =
      s"""{"metric":"total","value":10.0,"unit":"sec","queries":{"q1_agg":1.0,"q_topk":0.2},""" +
        s""""queries_max":{"q1_agg":3.0,"q_topk":0.4},""" +
        s""""queries_median":{"q1_agg":2.0,"q_topk":0.3},""" +
        s""""regressions":[],"runs":3,"sf":"$sf"}"""
    val m = Bench.parsePriorQueryTimes(raw, sf)
    assert(m == Map("q1_agg" -> 2.0, "q_topk" -> 0.3))
  }

  test("pre-median artifact: falls back to the min map") {
    val raw =
      s"""{"metric":"total","value":10.0,"queries":{"q1_agg":1.5},"runs":2,"sf":"$sf"}"""
    assert(Bench.parsePriorQueryTimes(raw, sf) == Map("q1_agg" -> 1.5))
  }

  test("driver wrapper shape: escaped tail parses, truncated leading map is skipped") {
    // Mimics BENCH_r09.json: the tail keeps only the END of stdout, so the
    // "queries" marker itself is cut off and only queries_max (complete)
    // plus trailing fields survive, all backslash-escaped. No median map,
    // no complete min map → empty (queries_max must NOT be used: maxes
    // compared to medians would fire spurious regressions).
    val tail = """agg\":1.0,\"q_topk\":0.2},\"queries_max\":{\"q1_agg\":3.0,\"q_topk\":0.4},\"runs\":3,\"sf\":\"""" +
      sf.replace("/", "\\/") // escaped-solidus variant must also not crash
    val wrapper = s"""{"n":9,"rc":0,"cpus":32,"sf":0.1,"tail":"$tail","parsed":null}"""
    assert(Bench.parsePriorQueryTimes(wrapper, sf) == Map.empty[String, Double])

    // ...but a wrapper whose tail RETAINS the median map parses it.
    val tail2 = """x\":1},\"queries_median\":{\"q1_agg\":2.0},\"regressions\":[],\"runs\":3,\"sf\":\"""" + sf + """\"}"""
    val wrapper2 = s"""{"n":9,"rc":0,"tail":"$tail2","parsed":null}"""
    assert(Bench.parsePriorQueryTimes(wrapper2, sf) == Map("q1_agg" -> 2.0))
  }

  test("a different scale factor yields no baseline") {
    val raw =
      s"""{"metric":"total","queries_median":{"q1_agg":2.0},"queries":{"q1_agg":1.0},"sf":"/root/testdata/sf0.01"}"""
    assert(Bench.parsePriorQueryTimes(raw, sf).isEmpty)
  }

  test("regression rows: slowdown >1.5x flags, and a FAILED query flags louder than any slowdown") {
    val prev = Map("q_fast" -> 1.0, "q_slow" -> 2.0, "q_broken" -> 10.4, "q_gone" -> 0.0)
    val meds = Seq(
      "q_fast" -> 1.2,     // 1.2x: under the tripwire, no row
      "q_slow" -> 4.0,     // 2.0x: slowdown row
      "q_broken" -> -1.0,  // was 10.4 s, now failed: MUST appear (r16 silently hid this)
      "q_gone" -> -1.0,    // prior time not positive: nothing to compare against
      "q_new" -> 3.0)      // no prior entry: no row
    val rows = Bench.regressionRows(meds, prev, "BENCH_rXX.json")
    assert(rows.size == 2)
    assert(rows.exists(r => r.contains("\"q\":\"q_slow\"") && r.contains("\"ratio\":2.0")))
    val broken = rows.filter(_.contains("\"q\":\"q_broken\""))
    assert(broken.size == 1 && broken.head.contains("\"failed\":true")
      && broken.head.contains("\"prev\":10.4"))
    assert(!rows.exists(_.contains("q_gone")) && !rows.exists(_.contains("q_new")))
  }

  test("regression rows carry the capture's sentinel inflations") {
    // VERDICT r17 #1: a reader of one row must see the capture's noise
    // state — r17's 12 phantom regressions were only diagnosable by
    // cross-referencing the calibration_latency block elsewhere.
    val rows = Bench.regressionRows(Seq("q_slow" -> 4.0), Map("q_slow" -> 2.0),
      "BENCH_rXX.json", calInflation = 1.2, latInflation = 3.499,
      memInflation = 1.31)
    assert(rows.size == 1)
    assert(rows.head.contains("\"cal_inflation\":1.2")
      && rows.head.contains("\"lat_inflation\":3.499")
      && rows.head.contains("\"mem_inflation\":1.31"))
  }

  test("a zero-overlap clean candidate is as loud as no artifact at all (ADVICE r19)") {
    // A clean candidate sharing NO queries with the current headline set
    // (every query renamed, or a foreign artifact family) must not win
    // maxBy with overlap score 0 — that makes the tripwire silently
    // compare nothing where the empty-candidates path would have warned.
    val hl = Set("q1_agg", "q_topk")
    val foreign = s"""{"queries_median":{"q_gone_a":1.0,"q_gone_b":2.0},"sf":"$sf"}"""
    assert(Bench.choosePrior(Seq("BENCH_r18.json" -> foreign), sf, hl).isEmpty)
    // ...and a zero-overlap candidate never out-ranks a partial overlap.
    val partial = s"""{"queries_median":{"q1_agg":2.0},"sf":"$sf"}"""
    val got = Bench.choosePrior(
      Seq("foreign" -> foreign, "partial" -> partial), sf, hl)
    assert(got == Some("partial" -> Map("q1_agg" -> 2.0)))
  }

  test("contaminated prior artifacts are skipped by the tripwire, raw and wrapper-escaped") {
    assert(Bench.isContaminated("""{"contaminated":true,"sf":"x"}"""))
    assert(Bench.isContaminated("""{"tail":"...,\"contaminated\":true,...","parsed":null}"""))
    assert(!Bench.isContaminated("""{"contaminated":false,"sf":"x"}"""))
    assert(!Bench.isContaminated("""{"queries":{"q1_agg":1.0}}""")) // pre-tag artifact = clean

    val dirty =
      s"""{"queries_median":{"q1_agg":9.0,"q_topk":9.0},"contaminated":true,"sf":"$sf"}"""
    val clean = s"""{"queries_median":{"q1_agg":2.0},"sf":"$sf"}"""
    val hl = Set("q1_agg", "q_topk", "q_pagerank")
    val got = Bench.choosePrior(
      Seq("BENCH_r18.json" -> dirty, "BENCH_full_clean_sf0.1.json" -> clean), sf, hl)
    assert(got == Some("BENCH_full_clean_sf0.1.json" -> Map("q1_agg" -> 2.0)))
    // Nothing clean and parseable → None (the caller prints no_comparable_artifact).
    assert(Bench.choosePrior(Seq("a" -> dirty), sf, hl).isEmpty)
  }

  test("a small clean probe never shadows a larger clean board") {
    // r17: a 3-query isolation probe overwrote BENCH_full_latest.json;
    // the tripwire must prefer the candidate overlapping the most of the
    // CURRENT headline set, ties broken by recency (candidate order).
    val hl = Set("q1_agg", "q_topk", "q_pagerank")
    val probe = s"""{"queries_median":{"q_pagerank":3.0},"sf":"$sf"}"""
    val board = s"""{"queries_median":{"q1_agg":2.0,"q_topk":0.3,"q_pagerank":2.6},"sf":"$sf"}"""
    val got = Bench.choosePrior(
      Seq("BENCH_full_latest.json" -> probe, "BENCH_full_clean_sf0.1.json" -> board), sf, hl)
    assert(got.map(_._1) == Some("BENCH_full_clean_sf0.1.json"))
    // Equal coverage → the earlier (more recent) candidate wins.
    val got2 = Bench.choosePrior(Seq("new" -> board, "old" -> board), sf, hl)
    assert(got2.map(_._1) == Some("new"))
  }

  test("a stale board of removed queries cannot out-rank a newer headline-matching baseline (ADVICE r18)") {
    // choosePrior ranks by overlap with the CURRENT headline set, not raw
    // entry count: a wide old board whose queries were since renamed or
    // removed scores only on what the tripwire can still compare.
    val hl = Set("q1_agg", "q_topk")
    val stale = s"""{"queries_median":{"q_old_a":1.0,"q_old_b":1.0,"q_old_c":1.0,"q1_agg":2.0},"sf":"$sf"}"""
    val fresh = s"""{"queries_median":{"q1_agg":2.1,"q_topk":0.3},"sf":"$sf"}"""
    val got = Bench.choosePrior(Seq("fresh" -> fresh, "stale" -> stale), sf, hl)
    assert(got.map(_._1) == Some("fresh"))
  }

  test("the real committed r9 artifact parses without crashing and without inventing a baseline") {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/BENCH_r09.json")), "UTF-8")
    // r9's tail is truncated before the median map existed; the min map's
    // opening marker is cut too — the safe answer is "no baseline".
    assert(Bench.parsePriorQueryTimes(raw, sf).isEmpty)
  }
}
