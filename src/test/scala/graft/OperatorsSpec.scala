package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // ------------------------------------------------------------- text

  test("token/punct/stopword counts") {
    val df = Seq("the cat, sat!  on a mat").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount($"text"),
      TextAnalysis.punctCount($"text"),
      TextAnalysis.stopwordCount($"text"),
      TextAnalysis.regexTokenCount($"text")).collect()(0)
    // tokens: the|cat,|sat!|<empty from double space>|on|a|mat = 7
    // regex tokens: the|cat|,|sat|!|on|a|mat = 8
    assert(r == Row(7, 2, 2, 8))
  }

  test("langId routes real sentences and CJK") {
    val df = Seq(
      (1L, "the quick brown fox is happy and it was fun"),
      (2L, "el perro corre en la casa y es un dia feliz por fin"),
      (3L, "der Hund ist nicht mit der Katze und das ist gut"),
      (4L, "le chat est dans les jardins et une fleur pour vous"),
      (5L, "这 是 一个 中文 句子"),
    ).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("quality score is in [0,1] and favors clean prose") {
    val df = Seq(
      ("clean", "the engine reads a table and it is fast to scan the data in one pass for all of it"),
      ("junk", "@@@@ ##### !!!! ???? %%%%")).toDF("k", "text")
    val s = df.select($"k", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(s("clean") > s("junk"))
  }

  test("word shingles: sliding, distinct, short-doc fallback") {
    val df = Seq("a b c d", "x y").toDF("text")
    val r = df.select(TextAnalysis.wordShingles($"text", 3)).as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq("x y"))
  }

  test("randomProject: deterministic matrix, JL distance preservation") {
    val m1 = Similarity.projectionMatrix(16, 4, 7L)
    val m2 = Similarity.projectionMatrix(16, 4, 7L)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(Similarity.projectionMatrix(16, 4, 8L).map(_.toSeq).toSeq != m1.map(_.toSeq).toSeq)

    // JL: pairwise distances survive 64 -> 32 within a modest distortion
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextGaussian()))).toSeq
    val df = vecs.toDF("id", "v")
    val proj = Similarity.randomProject(df, $"id", $"v", outDims = 32, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.toMap.map { case (k, v) => k -> v }
    val ratios = for {
      i <- 0L until 20L; j <- (i + 1) until 20L
    } yield d(proj(i), proj(j)) / d(orig(i), orig(j))
    assert(ratios.forall(r => r > 0.5 && r < 1.7),
      s"distorted beyond JL expectation: min ${ratios.min}, max ${ratios.max}")
  }

  test("sketch aggregates stay within declared error of the exact answer") {
    val df = (0 until 200000).map(i => (i % 37231, (i % 9973).toDouble)).toDF("k", "v")
    val r = df.agg(
      approx_count_distinct($"k", rsd = 0.02).as("ad"),
      expr("approx_percentile(v, 0.5, 10000)").as("p50s"),
      countDistinct($"k").as("d"),
      expr("percentile(v, 0.5)").as("p50")).head()
    val (ad, d) = (r.getLong(0), r.getLong(2))
    // HLL++ at rsd 2%: allow 3 sigma
    assert(math.abs(ad - d).toDouble / d < 0.06, s"approx $ad vs exact $d")
    // quantile sketch at accuracy 10000: rank error <= n/10000; generous
    // value bound via neighboring exact percentiles
    val (lo, hi) = df.agg(expr("percentile(v, 0.49)"), expr("percentile(v, 0.51)"))
      .as[(Double, Double)].head()
    assert(r.getDouble(1) >= lo && r.getDouble(1) <= hi,
      s"sketch p50 ${r.getDouble(1)} outside [$lo, $hi]")
  }

  test("weightedMix: exact epoch floors, md5 fractional tier, zero drops") {
    val df = (0L until 9000L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3)))
      .toDF("id", "src")
    val mixed = Sampling.weightedMix(df, $"id", $"src",
      Map("a" -> 2.5, "b" -> 0.25, "c" -> 0.0), defaultWeight = 1.0)
    val perSrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 3000 docs ×2.5 expected; md5 tier is deterministic, tolerance
    // only covers the hash's uniformity, not run-to-run noise
    assert(perSrc("a") >= 7200 && perSrc("a") <= 7800, s"got ${perSrc("a")}")
    assert(perSrc("b") >= 600 && perSrc("b") <= 900, s"got ${perSrc("b")}")
    assert(!perSrc.contains("c"), "zero weight must drop the source")
    // epochs are contiguous 0..n-1 per doc
    val epochs = mixed.where($"src" === "a").groupBy("id")
      .agg(count(lit(1)).as("n"), min("epoch").as("mn"), max("epoch").as("mx"))
    assert(epochs.where(col("mn") =!= 0 || col("mx") =!= col("n") - 1).isEmpty)
    assert(epochs.where(col("n") < 2 || col("n") > 3).isEmpty)
    // pure function of (id, salt): partitioning cannot change the multiset
    val again = Sampling.weightedMix(df.repartition(17), $"id", $"src",
      Map("a" -> 2.5, "b" -> 0.25, "c" -> 0.0), defaultWeight = 1.0)
    assert(mixed.except(again).isEmpty && again.except(mixed).isEmpty)
    assert(mixed.count() == again.count())
  }

  test("lmScore: exact quantized surprisal, xent values, null text dropped, invariant") {
    // corpus counts: a:2 b:2 c:1, N=5. floorlog2: fl(5)=2, fl(2)=1,
    // fl(1)=0 -> qbits a=1 b=1 c=2.
    // doc1 (a a b): n=3 sq=3 -> bits_q=1.0; doc2 (b c): n=2 sq=3 -> 1.5.
    val df = Seq((1L, Some("a a b")), (2L, Some("b c")), (3L, None))
      .toDF("id", "text")
    val out = TextAnalysis.lmScore(df, $"id", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L), s"null-text doc must be dropped: ${out.keySet}")
    assert(out(1L)._1 == 3L && out(1L)._2 == 1.0)
    assert(out(2L)._1 == 2L && out(2L)._2 == 1.5)
    // real-valued cross-entropy (engine-only column): mean(log2 N - log2 c)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    assert(math.abs(out(1L)._3 - (lg2(5) - lg2(2))) < 1e-9)
    assert(math.abs(out(2L)._3 - ((lg2(5) - lg2(2)) + (lg2(5) - lg2(1))) / 2) < 1e-9)
    // grid-summed xent is partitioning-INVARIANT (raw bits), not just close
    val rep = TextAnalysis.lmScore(df.repartition(7), $"id", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3))))).toMap
    assert(rep == out.map { case (k, (n, b, x)) => k -> ((n,
      java.lang.Double.doubleToRawLongBits(b),
      java.lang.Double.doubleToRawLongBits(x))) })
  }

  test("lmScoreBigram: conditional surprisal exact, single-token doc, order sensitivity") {
    // corpus: doc1 "a a b", doc2 "b c", doc3 "a" (single token), doc4 null.
    // unigram: a:3 b:2 c:1, N=6 -> fl(6)=2; fl(3)=1, fl(2)=1, fl(1)=0.
    // bigrams: (a,a):1 (a,b):1 (b,c):1; heads: a->2, b->1.
    // doc1: first a: 2-1=1; (a,a): fl(2)-fl(1)=1; (a,b): 1 -> n=3 sq=3 -> 1.0
    // doc2: first b: 2-1=1; (b,c): fl(1)-fl(1)=0 -> n=2 sq=1 -> 0.5
    // doc3: first a only -> n=1 sq=1 -> 1.0
    val df = Seq((1L, Some("a a b")), (2L, Some("b c")), (3L, Some("a")),
      (4L, None)).toDF("id", "text")
    val out = TextAnalysis.lmScoreBigram(df, $"id", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out == Map(1L -> ((3L, 1.0)), 2L -> ((2L, 0.5)), 3L -> ((1L, 1.0))))
    // order sensitivity: same token multiset, different order, different score
    val ord = Seq((1L, "x x y y"), (2L, "x y x y")).toDF("id", "text")
    val s = TextAnalysis.lmScoreBigram(ord, $"id", $"text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // bigrams: (x,x):1 (x,y):3 (y,x):1 (y,y):1; heads x->4, y->2
    // doc1: first x: fl(8)-fl(4)=1; (x,x): fl(4)-fl(1)=2; (x,y): fl(4)-fl(3)=1;
    //       (y,y): fl(2)-fl(1)=1 -> 5/4
    // doc2: first x: 1; (x,y): 1; (y,x): fl(2)-fl(1)=1; (x,y): 1 -> 4/4
    assert(s(1L) == 1.25 && s(2L) == 1.0)
    // partitioning invariance, raw bits
    val rep = TextAnalysis.lmScoreBigram(df.repartition(7), $"id", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))))).toMap
    assert(rep == out.map { case (k, (n, b)) =>
      k -> ((n, java.lang.Double.doubleToRawLongBits(b))) })
  }

  test("bpeTokenCount: contraction/digit/punct splits, ws-vs-bpe divergence") {
    // "don't stop, it's 2024!" under the pattern:
    //   don|'t| stop|,| it|'s| 2024|! = 8 bpe tokens, 4 ws tokens
    // "aaa bbb" = [aaa| bbb] 2 bpe, 2 ws
    val df = Seq((1L, Some("don't stop, it's 2024!")), (2L, Some("aaa bbb")),
      (3L, None)).toDF("id", "text")
    val out = TextAnalysis.bpeTokenCount(df, $"id", $"text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out == Map(1L -> ((22, 4L, 8L, 22.0 / 8)), 2L -> ((7, 2L, 2L, 3.5))))
    // empty text: one ws token (split of "" is [""]), zero bpe matches,
    // guarded ratio
    val empty = TextAnalysis.bpeTokenCount(
      Seq((1L, "")).toDF("id", "text"), $"id", $"text").collect()(0)
    assert(empty.getLong(2) == 1L && empty.getLong(3) == 0L && empty.getDouble(4) == 0.0)
  }

  test("importanceWeights/importanceSelect: DSIR fixture, ranking, tie-break, invariance") {
    // buckets: 'good' -> 1680, 'bad' -> 1854, 'meh' -> 2040 at B=4096 (no
    // collisions — md5 is fixed, so this holds forever or fails loudly).
    // raw: d1 "good good", d2 "bad bad", d3 "good bad", d4 null.
    // target: "good good good" -> c_t(good)=3, c_t(bad)=0; c_r(good)=3, c_r(bad)=3.
    // q(good) = fl(4) - fl(4) = 0; q(bad) = fl(1) - fl(4) = -2.
    // d1: (0+0)/2 = 0.0; d2: (-2-2)/2 = -2.0; d3: (0-2)/2 = -1.0.
    val raw = Seq((1L, Some("good good")), (2L, Some("bad bad")),
      (3L, Some("good bad")), (4L, None)).toDF("id", "text")
    val target = Seq(Tuple1("good good good")).toDF("text")
    val w = TextAnalysis.importanceWeights(raw, target, $"id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(w == Map(1L -> ((2L, 0L, 0.0)), 2L -> ((2L, -4L, -2.0)),
      3L -> ((2L, -2L, -1.0))))
    // selection: k=2 keeps the two most target-like, ranked
    val sel = TextAnalysis.importanceSelect(raw, target, $"id", $"text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toSet
    assert(sel == Set((1L, 1), (3L, 2)))
    // tie-break: equal scores order by doc_id (d1 and d5 both all-'good')
    val rawTie = Seq((5L, "good good"), (1L, "good")).toDF("id", "text")
    val tie = TextAnalysis.importanceSelect(rawTie, target, $"id", $"text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toSet
    assert(tie == Set((1L, 1), (5L, 2)))
    // partitioning invariance, raw score bits
    val rep = TextAnalysis.importanceWeights(raw.repartition(7), target, $"id", $"text")
      .collect().map(r => r.getLong(0) ->
        java.lang.Double.doubleToRawLongBits(r.getDouble(3))).toMap
    assert(rep == w.map { case (k, (_, _, s)) =>
      k -> java.lang.Double.doubleToRawLongBits(s) })
  }

  test("temperatureMixSqrt: sqrt shares, small source upweighted, clamp keeps all") {
    // 900 A + 100 B, target 500: w_A = 30e6, w_B = 10e6, W = 40e6;
    // rate_A = 500*30e6/40e6/900 = 0.41666..., rate_B = 1.25 -> clamp 1.
    val df = ((0L until 900L).map(i => (i, "A")) ++
      (1000L until 1100L).map(i => (i, "B"))).toDF("id", "src")
    val out = Sampling.temperatureMixSqrt(df, $"id", $"src", targetRows = 500)
    val perSrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("B") == 100, s"clamped source must keep all rows, got ${perSrc("B")}")
    // md5 uniformity tolerance around 0.4167*900 = 375
    assert(perSrc("A") >= 315 && perSrc("A") <= 435, s"got ${perSrc("A")}")
    // membership is a pure function of (id, salt): partitioning-invariant
    val again = Sampling.temperatureMixSqrt(df.repartition(13), $"id", $"src",
      targetRows = 500)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // output carries exactly the input columns
    assert(out.columns.toSeq == Seq("id", "src"))
    // temperature actually rebalances: B's share of the sample far exceeds
    // its 10% natural share
    val bShare = perSrc("B").toDouble / (perSrc("A") + perSrc("B"))
    assert(bShare > 0.18, s"B share $bShare not upweighted")
  }

  test("temperatureMixSqrt: planted NULL strata neither keepable nor weight-inflating") {
    // 400 A + 100 B + 500 NULL, target 300. Contract (Sampling.scala):
    // null-stratum rows are excluded from the output AND the weight
    // table. With the filter: W = 20e6 + 10e6, rate_B = 300*10/30/100
    // = 1.0 -> clamp 'g' keeps ALL 100 B rows. If the filter were
    // removed, the null stratum's w = floor(sqrt(500)*1e6) would
    // inflate W to ~52.4e6 and depress rate_B to ~0.57 — so the
    // exact-100 assertion FAILS without the filter (P[all 100 survive
    // a 0.57 cut] ~ 0), not just survives it.
    val df = ((0L until 400L).map(i => (i, Some("A"))) ++
      (1000L until 1100L).map(i => (i, Some("B"))) ++
      (2000L until 2500L).map(i => (i, None: Option[String]))).toDF("id", "src")
    val out = Sampling.temperatureMixSqrt(df, $"id", $"src", targetRows = 300)
    assert(out.where($"src".isNull).isEmpty, "null-stratum rows must never be kept")
    val perSrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("B") == 100,
      s"B must clamp to keep-all when nulls are excluded from W, got ${perSrc("B")}")
    // rate_A = 0.5 exactly; md5 uniformity tolerance around 200
    assert(perSrc("A") >= 150 && perSrc("A") <= 250, s"got ${perSrc("A")}")
  }

  test("chunkTokens: stride/overlap coverage, short docs, nulls") {
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "short doc"),                      // 2 tokens -> one chunk
      (3L, null.asInstanceOf[String]),        // no chunks
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokens(df, $"doc_id", $"text", maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3), r.getInt(4)))
    // stride 3: starts 0,3,6 cover tokens 1-4, 4-7, 7-10
    assert(got.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "short doc", 2)))
    // consecutive chunks of the same doc share exactly `overlap` tokens
    val c = got.filter(_._1 == 1L).map(_._3.split(" ").toSeq).toSeq
    assert(c.sliding(2).forall { case Seq(a, b) => a.takeRight(1) == b.take(1) })
    // a chunk count is never 0 and every token lands in some chunk
    assert(c.flatten.distinct.size == 10)
    assertThrows[IllegalArgumentException] {
      TextAnalysis.chunkTokens(df, $"doc_id", $"text", maxTokens = 4, overlap = 4)
    }
  }

  test("dropBoilerplateLines removes frequent lines, keeps order, handles edges") {
    val df = Seq(
      (1L, "BANNER\nunique line one\nFOOTER"),
      (2L, "BANNER\nunique line two\nFOOTER"),
      (3L, "BANNER\nanother body line\nand one more\nFOOTER"),
      (4L, "BANNER\nFOOTER"),                 // all boilerplate -> empty
      (5L, "totally unique document text"),   // untouched
      (6L, null.asInstanceOf[String]),        // null passes through
    ).toDF("doc_id", "text")
    val r = TextAnalysis.dropBoilerplateLines(df, $"doc_id", $"text", minDocFreq = 3)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1), if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, "unique line one", 1L, 2L),
      (2L, "unique line two", 1L, 2L),
      (3L, "another body line\nand one more", 2L, 2L),
      (4L, "", 0L, 2L),
      (5L, "totally unique document text", 1L, 0L),
      (6L, null, -1L, -1L)))
  }

  test("redactPii scrubs emails/IPs/phones; counts audit the originals") {
    val df = Seq(
      (1L, "mail bob.smith+tag@corp.example.org and carol@ex.io now"),
      (2L, "host 192.168.0.17 gateway 10.0.0.1"),
      (3L, "call +14155552671 or +442071838750"),
      (4L, "a+1234567@x.com keeps its plus tag inside the email"),
      (5L, "nothing to hide here 1.2 v3.4.5 plus plain 5551234"),
      (6L, null.asInstanceOf[String]),
    ).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.redactPii($"text").as("red"),
        TextAnalysis.emailCount($"text").as("e"),
        TextAnalysis.ipv4Count($"text").as("i"),
        TextAnalysis.phoneCount($"text").as("p"))
      .orderBy("id").collect()
    assert(r(0).getString(1) == "mail <EMAIL> and <EMAIL> now")
    assert((r(0).getInt(2), r(0).getInt(3), r(0).getInt(4)) == ((2, 0, 0)))
    assert(r(1).getString(1) == "host <IP> gateway <IP>")
    assert(r(2).getString(1) == "call <PHONE> or <PHONE>")
    // email-first ordering: the plus-tagged local part never becomes <PHONE>
    assert(r(3).getString(1).startsWith("<EMAIL> keeps"))
    // version strings and bare 7-digit runs are NOT redacted
    assert(r(4).getString(1) == "nothing to hide here 1.2 v3.4.5 plus plain 5551234")
    assert(r(5).get(1) == null)
  }

  // ------------------------------------------------------------ dedup

  test("exactKeepFirst keeps the smallest tie-break row per key") {
    val df = Seq((3L, "k1", "z"), (1L, "k1", "a"), (2L, "k2", "b")).toDF("id", "k", "v")
    val kept = Dedup.exactKeepFirst(df, Seq("k"), "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("minhash finds planted near-duplicates, not unrelated docs") {
    val base = "spark reads the columnar table and scans only the blocks it needs for the query plan"
    val nearDup = base.replace("query", "physical")      // 1-word edit
    val unrelated = "completely different words about cooking pasta with tomato sauce and fresh basil leaves"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, $"doc_id", $"text",
        Dedup.MinHashParams(jaccardThreshold = 0.4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash near-dups have full recall within the hamming radius") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    val oneEdit = base.replace("theta", "sigma")
    val other = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    val df = Seq((1L, base), (2L, oneEdit), (3L, other)).toDF("doc_id", "text")
    val sims = df.select(Dedup.simhash64("text")).as[Long].collect()
    val ham12 = java.lang.Long.bitCount(sims(0) ^ sims(1))
    val pairs = Dedup.simhashNearDups(df, $"doc_id", $"text", maxHamming = 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // pigeonhole guarantee: if the true distance ≤ radius the pair IS found
    if (ham12 <= 7) assert(pairs.get((1L, 2L)).contains(ham12))
    assert(java.lang.Long.bitCount(sims(0) ^ sims(2)) > 7)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash is deterministic across runs") {
    val df = Seq("some stable text for hashing").toDF("text")
    val a = df.select(Dedup.simhash64("text")).as[Long].collect()(0)
    val b = df.select(Dedup.simhash64("text")).as[Long].collect()(0)
    assert(a == b && a != 0L)
  }

  // ------------------------------------------------------- similarity

  test("bruteForceTopK ranks by exact cosine with id tie-break") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))).toDF("id", "vec")
    val top = Similarity.bruteForceTopK(df, df.where($"id" === 1), k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 3L))   // nearest, then orthogonal
    assert(top(0).getInt(2) == 1 && top(1).getInt(2) == 2)
    // expected value must go through the same float32 storage the column does
    val (x, y) = (0.9f.toDouble, 0.1f.toDouble)
    val cos12 = x / math.sqrt(x * x + y * y)
    assert(math.abs(top(0).getDouble(3) - cos12) < 1e-15)
  }

  test("lshTopK returns a subset of brute-force results, deterministically") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 3)
    val ann1 = Similarity.lshTopK(df, q, k = 3, planes = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ann2 = Similarity.lshTopK(df, q, k = 3, planes = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ann1 == ann2)                  // seeded hyperplanes ⇒ stable
    assert(ann1.nonEmpty)
    // every ANN hit is a genuine corpus neighbor of its query
    val ids = vecs.map(_._1).toSet
    assert(ann1.forall { case (qid, nid, _) => ids(qid) && ids(nid) && qid != nid })
  }

  test("lsh multi-probe recall dominates single-probe recall") {
    val rnd = new scala.util.Random(21)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 10)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, k = 5))
    val single = pairs(Similarity.lshTopK(df, q, k = 5, planes = 6, dim = 16, multiProbe = false))
    val multi = pairs(Similarity.lshTopK(df, q, k = 5, planes = 6, dim = 16, multiProbe = true))
    val rSingle = (single intersect exact).size.toDouble / exact.size
    val rMulti = (multi intersect exact).size.toDouble / exact.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > 0.3, s"multi-probe recall unexpectedly low: $rMulti")
  }

  test("lsh tables=1 is bit-identical to the pre-multi-table path") {
    val rnd = new scala.util.Random(33)
    val vecs = (0L until 120L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 6)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    // the r15 recall-aware default: an unspecified table count resolves
    // to tablesDefault (4) — bit-identical to spelling it out; and table
    // 0 of any multi-table index hashes with the caller's seed
    // (tableSeed(seed, 0) == seed), so the explicit single-table result
    // is a subset of the default's candidates by construction
    val explicit4 = rows(Similarity.lshTopK(df, q, k = 4, planes = 5, dim = 16,
      tables = Similarity.tablesDefault))
    val default0 = rows(Similarity.lshTopK(df, q, k = 4, planes = 5, dim = 16))
    assert(explicit4 == default0)
  }

  test("lsh OR-amplification: more tables never lose recall, and gain it here") {
    val rnd = new scala.util.Random(44)
    val vecs = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 12)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, k = 5))
    def recall(tables: Int): Double = {
      val got = pairs(Similarity.lshTopK(df, q, k = 5, planes = 8, dim = 16,
        multiProbe = false, tables = tables))
      (got intersect exact).size.toDouble / exact.size
    }
    // Candidate sets are supersets as tables grow ONLY in expectation per
    // pair (each table is independent) — but table 0 of the t=4 index IS
    // the t=1 index (same seed), so every t=1 candidate survives and
    // measured recall is monotone here, not just expectedly so.
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"4-table recall $r4 < 1-table $r1")
    assert(r4 > r1, s"4 tables should find strictly more on this corpus (r1=$r1)")
    // deterministic (seeded corpus + seeded planes): r1=0.1, r4=0.2333 —
    // the bar guards against a regression to near-zero, not a point value
    assert(r4 > 0.15, s"4-table recall unexpectedly low: $r4")
  }

  test("lsh multi-table index: build once, search many batches, deterministic") {
    val rnd = new scala.util.Random(55)
    val vecs = (0L until 100L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val idx = Similarity.lshBuild(df, planes = 4, dim = 8, tables = 3)
    try {
      val a1 = Similarity.lshSearch(idx, df.where($"id" < 3), k = 3)
        .collect().map(_.toString).sorted.toSeq
      val a2 = Similarity.lshSearch(idx, df.where($"id" < 3), k = 3)
        .collect().map(_.toString).sorted.toSeq
      assert(a1 == a2 && a1.nonEmpty)
      // no self-pairs, no duplicate (query, neighbor) rows across tables
      val pairs = Similarity.lshSearch(idx, df.where($"id" < 3), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.distinct.length == pairs.length)
      assert(pairs.forall { case (a, b) => a != b })
    } finally idx.unpersist()
  }

  test("lsh recall is high on clustered data — low isotropic recall is the data, not the code") {
    // The bench corpus is near-isotropic gaussian noise, where ANY
    // bucketing scheme separates "neighbors" barely above chance — the
    // honest reason the bench's default-setting recall sits low. Planted
    // structure is the realistic regime (real embedding corpora cluster):
    // 40 well-separated centers × 8 members with small noise. A query's
    // true top-k then live in its own cluster, hyperplanes rarely split
    // a tight cluster, and default-ish LSH must find nearly all of them.
    val rnd = new scala.util.Random(66)
    val dim = 16
    val centers = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val vecs = for {
      c <- centers.indices
      m <- 0 until 8
    } yield ((c * 8 + m).toLong,
      centers(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" % 8 === 0).where($"id" < 80) // one probe per first 10 clusters
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(df, q, k = 5))
    val ann = pairs(Similarity.lshTopK(df, q, k = 5, planes = 8, dim = dim))
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered-data LSH recall $recall < 0.9")
  }

  test("lsh multi-table candidate set structurally contains the single-table set") {
    // Not a statistical claim: table 0 of a t-table index hashes with the
    // caller's seed, i.e. IS the t=1 index, and tables only union
    // candidates — so for ANY corpus/queries/seed the t=1 result pairs
    // survive into the t=4 candidate pool. Checked across several random
    // corpora (k large enough that top-k truncation cannot evict them —
    // every candidate scores identically in both runs and k exceeds the
    // largest candidate count).
    for (seed <- Seq(1, 7, 19)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      val df = vecs.toDF("id", "vec")
      val q = df.where($"id" < 4)
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t1 = pairs(Similarity.lshTopK(df, q, k = 60, planes = 4, dim = 8, seed = seed,
        tables = 1))
      val t4 = pairs(Similarity.lshTopK(df, q, k = 60, planes = 4, dim = 8, seed = seed,
        tables = 4))
      assert(t1.subsetOf(t4),
        s"seed=$seed: single-table pairs ${t1 -- t4} missing from the 4-table result")
    }
  }

  test("AutoDim derives dimensionality from the data, not a remembered constant") {
    val rnd = new scala.util.Random(77)
    // 24-dim corpus: NOT the historical default of 64 — the drift case
    val vecs = (0L until 80L).map(i => (i, Array.fill(24)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    assert(Similarity.observedDim(df, $"vec") == 24)
    assert(Similarity.observedDim(df.where($"id" < 0), $"vec") == 0) // empty → 0
    // Mixed widths throw LOUDLY (ADVICE r9): a sampled width would leave
    // the other rows nulling every projection — the silent bucket-0
    // quadratic degeneration AutoDim exists to prevent.
    val ragged = df.unionByName(Seq((999L, Array.fill(8)(0.5f))).toDF("id", "vec"))
    val mixedErr = intercept[IllegalArgumentException] {
      Similarity.observedDim(ragged, $"vec")
    }
    assert(mixedErr.getMessage.contains("mixed embedding widths"))
    val mixedAuto = intercept[IllegalArgumentException] {
      Similarity.lshTopK(ragged, ragged.where($"id" < 4), k = 3).collect()
    }
    assert(mixedAuto.getMessage.contains("mixed embedding widths"))
    val q = df.where($"id" < 4)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toString).sorted.toSeq
    // AutoDim (the default) ≡ the explicitly-correct dim, bit-identical
    assert(rows(Similarity.lshTopK(df, q, k = 3, planes = 6))
      == rows(Similarity.lshTopK(df, q, k = 3, planes = 6, dim = 24)))
    // The hazard AutoDim removes: planes of the WRONG width null every
    // projection, every row lands in bucket 0, and "LSH" silently becomes
    // brute force — right answers, quadratic candidate stage. Pinned here
    // so the failure mode stays documented and detectable.
    val wrongDim = rows(Similarity.lshTopK(df, q, k = 3, planes = 6, dim = 64,
      multiProbe = false))
    val brute = rows(Similarity.bruteForceTopK(df, q, k = 3))
    assert(wrongDim == brute, "wrong-width planes should degenerate to one bucket")
    val genuine = rows(Similarity.lshTopK(df, q, k = 3, planes = 6, multiProbe = false))
    assert(genuine != brute, "real bucketing must drop some cross-bucket neighbor here")
    // semanticDedup rides the same derivation
    assert(rows(Dedup.semanticDedup(df, $"id", $"vec", threshold = 0.2, coarseBits = 3))
      == rows(Dedup.semanticDedup(df, $"id", $"vec", threshold = 0.2, coarseBits = 3,
        dim = 24)))
  }

  test("AutoPlanes plans plane count from corpus size; auto == explicit") {
    // The formula: ceil-log2(n / targetBucket), floor 0, cap 62 — bucket
    // population stays ~targetBucket at any corpus size.
    assert(Similarity.planesFor(0) == 0)
    assert(Similarity.planesFor(128) == 0)   // n <= target: one bucket
    assert(Similarity.planesFor(129) == 1)
    assert(Similarity.planesFor(2000) == 4)  // the sf0.1 embeddings corpus
    assert(Similarity.planesFor(1L << 40) == 33)
    assert(Similarity.planesFor(Long.MaxValue) == 56) // ceil-log2(2^63 / 128)
    assert(Similarity.planesFor(Long.MaxValue, targetBucket = 1) == 62) // cap
    assert(Similarity.ivfBitsFor(2000) == 3) // 256-vector target lists
    // r15 recall-aware width: 2 x ceil(sqrt(lists)), floor 2
    assert(Similarity.nProbeFor(0) == 2 && Similarity.nProbeFor(4) == 8 &&
      Similarity.nProbeFor(10) == 64)
    val rnd = new scala.util.Random(11)
    val df = (0L until 300L).map(i => (i, Array.fill(16)(rnd.nextGaussian())))
      .toDF("id", "vec")
    val q = df.where($"id" < 4)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toString).sorted.toSeq
    // the fully-auto path is bit-identical to spelling every planned
    // knob out (VERDICT r14 #5's "spec pins auto == explicit"): tables
    // default to tablesDefault with buckets targeted at 64 x tables,
    // IVF spills spillDefault entries per vector
    assert(rows(Similarity.lshTopK(df, q, k = 3))
      == rows(Similarity.lshTopK(df, q, k = 3,
        planes = Similarity.planesFor(300, 64L * Similarity.tablesDefault),
        tables = Similarity.tablesDefault)))
    assert(rows(Similarity.ivfTopK(df, q, k = 3))
      == rows(Similarity.ivfTopK(df, q, k = 3,
        coarseBits = Similarity.ivfBitsFor(300),
        nProbe = Similarity.nProbeFor(Similarity.ivfBitsFor(300)),
        spill = Similarity.spillDefault)))
    // a tiny corpus plans to 0 planes = one bucket = exact brute force
    val tiny = df.where($"id" < 60)
    assert(rows(Similarity.lshTopK(tiny, tiny.where($"id" < 4), k = 3))
      == rows(Similarity.bruteForceTopK(tiny, tiny.where($"id" < 4), k = 3)))
  }

  test("ivfTopK with full probe equals brute force; partial probe is a subset") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 80L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 4)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val brute = Similarity.bruteForceTopK(df, q, k = 3).collect().map(key).toSet
    // nProbe = 2^coarseBits probes every inverted list ⇒ must equal exact
    val full = Similarity.ivfTopK(df, q, k = 3, coarseBits = 3, nProbe = 8, dim = 8)
      .collect().map(key).toSet
    assert(full == brute)
    // partial probe: approximate, but every (query, rank) it returns is a
    // genuine neighbor and ranks stay contiguous from 1
    val part = Similarity.ivfTopK(df, q, k = 3, coarseBits = 3, nProbe = 2, dim = 8)
      .collect().map(key)
    assert(part.nonEmpty)
    val byQ = part.groupBy(_._1)
    assert(byQ.values.forall(rs => rs.map(_._3).sorted.sameElements(1 to rs.length)))
  }

  test("pqTopK: exhaustive refine equals brute force; codes are m small ints") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 80L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    val q = df.where($"id" < 4)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    val brute = Similarity.bruteForceTopK(df, q, k = 3).collect().map(key).toSet
    // k×refine ≥ corpus: the ADC pass passes everything to the exact
    // refine, so the result must equal brute force bit-for-bit
    val exhaustive = Similarity.pqTopK(df, q, k = 3, m = 4, bits = 3,
      refine = 40, dim = 8).collect().map(key).toSet
    assert(exhaustive == brute)
    // codes: m entries, each within the signature range
    val idx = Similarity.pqBuild(df, m = 4, bits = 3, dim = 8)
    try {
      val codes = idx.codes.select($"codes").collect().map(_.getSeq[Long](0))
      assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0L && x < 8L)))
    } finally idx.unpersist()
  }

  test("pq ADC ranking finds planted near-duplicates without refine help") {
    // 10 tight clusters: the nearest neighbor of each query is its
    // planted twin; ADC over 4-bit codes must surface it at rank 1 even
    // with refine = 1 (no exact re-rank beyond the candidate set itself)
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian() * 3))
    val rows = (0 until 10).flatMap { c =>
      Seq((c.toLong, centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)),
        ((c + 100).toLong, centers(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)))
    }
    val df = rows.toDF("id", "vec")
    val q = df.where($"id" < 10)
    val top1 = Similarity.pqTopK(df, q, k = 1, m = 4, bits = 4, refine = 1, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 10L).foreach { c =>
      assert(top1(c) == c + 100, s"query $c: ADC rank-1 was ${top1(c)}, want ${c + 100}")
    }
  }

  test("one-shot ANN calls leak no cached blocks; index builds persist until released") {
    val vecs = (0L until 30L).map(i => (i, Array.fill(8)((i % 5).toFloat + 1f)))
    val df = vecs.toDF("id", "vec")
    def cached = spark.sparkContext.getPersistentRDDs.size
    val before = cached
    Similarity.lshTopK(df, df.where($"id" < 2), k = 2, planes = 4, dim = 8).collect()
    Similarity.ivfTopK(df, df.where($"id" < 2), k = 2, coarseBits = 3, nProbe = 8, dim = 8).collect()
    assert(cached == before, s"one-shot ANN leaked ${cached - before} cached RDD(s)")
    val idx = Similarity.lshBuild(df, planes = 4, dim = 8)
    Similarity.lshSearch(idx, df.where($"id" < 2), k = 2).collect()
    assert(cached == before + 1)
    idx.unpersist()
    assert(cached == before)
  }

  test("lsh index: one build serves many query batches identically") {
    val rnd = new scala.util.Random(37)
    val vecs = (0L until 50L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val idx = Similarity.lshBuild(df, planes = 4, dim = 8)
    try {
      val batch = Similarity.lshSearch(idx, df.where($"id" < 3), k = 3)
        .collect().map(key).toSet
      val oneShot = Similarity.lshTopK(df, df.where($"id" < 3), k = 3, planes = 4, dim = 8)
        .collect().map(key).toSet
      assert(batch == oneShot && batch.nonEmpty)
    } finally idx.unpersist()
  }

  test("ivf index: one build serves many query batches identically") {
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "vec")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val idx = Similarity.ivfBuild(df, coarseBits = 3, dim = 8)
    try {
      val batch1 = Similarity.ivfSearch(idx, df.where($"id" < 3), k = 3, nProbe = 8)
        .collect().map(key).toSet
      val batch2 = Similarity.ivfSearch(idx, df.where($"id" >= 3 && $"id" < 6), k = 3, nProbe = 8)
        .collect().map(key).toSet
      // each batch equals the one-shot path on the same queries
      assert(batch1 == Similarity.ivfTopK(df, df.where($"id" < 3), 3,
        coarseBits = 3, nProbe = 8, dim = 8).collect().map(key).toSet)
      assert(batch2 == Similarity.ivfTopK(df, df.where($"id" >= 3 && $"id" < 6), 3,
        coarseBits = 3, nProbe = 8, dim = 8).collect().map(key).toSet)
      assert(batch1.nonEmpty && batch2.nonEmpty)
    } finally idx.unpersist()
  }

  test("l2Normalize and quantizeInt8: exact units/codes, zero vectors degrade to null") {
    import graft.operators.Similarity
    val df = Seq(
      (1, Array(3.0f, 4.0f)),
      (2, Array(0.0f, 0.0f)),          // no direction → null unit/codes
      (3, Array(-0.5f, 0.25f, 1.0f)))
      .toDF("vec_id", "embedding")
    val u = Similarity.l2Normalize(df, $"vec_id", $"embedding")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(u(1).getDouble(1) == 5.0)
    assert(u(1).getSeq[Double](2) == Seq(0.6, 0.8))
    assert(u(2).isNullAt(2))
    val q = Similarity.quantizeInt8(df, $"vec_id", $"embedding")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(q(1).getDouble(1) == 127.0 / 4.0)
    assert(q(1).getSeq[Int](2) == Seq(95, 127)) // floor(3*31.75+.5)=95
    assert(q(2).isNullAt(1) && q(2).isNullAt(2))
    assert(q(3).getSeq[Int](2) == Seq(-63, 32, 127)) // floor(-63.5+.5), floor(31.75+.5)
    // round-trip error bounded by half a code step
    val dequant = q(3).getSeq[Int](2).map(_ / q(3).getDouble(1))
    dequant.zip(Seq(-0.5, 0.25, 1.0)).foreach { case (d, x) =>
      assert(math.abs(d - x) <= 0.5 / q(3).getDouble(1) + 1e-12) }
  }

  test("normStats sums norms exactly per group") {
    val df = Seq((0, Array(3.0f, 4.0f)), (0, Array(6.0f, 8.0f)), (1, Array(1.0f, 0.0f)))
      .toDF("label", "embedding")
    val r = Similarity.normStats(df, $"label", $"embedding")
      .orderBy("grp").collect()
    assert(r(0) == Row(0, 2L, 15.0))      // 5 + 10
    assert(r(1) == Row(1, 1L, 1.0))
  }

  test("decodeImages reads real PNG/JPEG dimensions; junk bytes degrade to -1") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int, fmt: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), fmt, b))
      b.toByteArray
    }
    val png = img(123, 45, "png")
    val jpg = img(64, 32, "jpg")
    val txt = "definitely not an image payload".getBytes("UTF-8")
    val df = Seq((1L, png, "image/png"), (2L, jpg, "image/jpeg"), (3L, txt, "text/plain"))
      .toDF("doc_id", "media", "media_type")
    val metas = Multimodal.decodeImages(df).collect().sortBy(_.doc_id)
    assert(metas(0).width == 123 && metas(0).height == 45 && metas(0).n_bytes == png.length)
    // null media must degrade like any poison row, not NPE the task
    val withNull = Seq((9L, null.asInstanceOf[Array[Byte]], "image/png"))
      .toDF("doc_id", "media", "media_type")
    val nm = Multimodal.decodeImages(withNull).collect()(0)
    assert(nm.width == -1 && nm.height == -1 && nm.n_bytes == 0)
    assert(metas(1).width == 64 && metas(1).height == 32)
    // corrupt/unknown payloads must degrade, not kill the task
    assert(metas(2).width == -1 && metas(2).height == -1 && metas(2).n_bytes == txt.length)
    val crc = new java.util.zip.CRC32(); crc.update(png)
    assert(metas(0).checksum == crc.getValue)
  }

  test("decodeAudio reads real WAV/AIFF headers; junk bytes degrade to -1") {
    import javax.sound.sampled._
    // a real 16-bit PCM WAV: 8000 Hz stereo, 4000 frames = 0.5 s
    def wav(rate: Float, channels: Int, frames: Int, fileType: AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, fileType, bos)
      bos.toByteArray
    }
    val w = wav(8000f, 2, 4000, AudioFileFormat.Type.WAVE)
    val a = wav(44100f, 1, 441, AudioFileFormat.Type.AIFF)
    val junk = "not audio at all, just text bytes".getBytes("UTF-8")
    val df = Seq((1L, w, "audio/wav"), (2L, a, "audio/aiff"), (3L, junk, "text/plain"),
      (4L, null.asInstanceOf[Array[Byte]], "audio/wav"))
      .toDF("doc_id", "media", "media_type")
    val metas = Multimodal.decodeAudio(df).collect().sortBy(_.doc_id)
    assert(metas(0).sample_rate == 8000.0 && metas(0).channels == 2 && metas(0).bits == 16)
    assert(metas(0).frames == 4000L && math.abs(metas(0).duration_secs - 0.5) < 1e-9)
    assert(metas(1).sample_rate == 44100.0 && metas(1).channels == 1 &&
      math.abs(metas(1).duration_secs - 0.01) < 1e-9)
    // poison rows degrade, never NPE/kill the task
    assert(metas(2).sample_rate == -1.0 && metas(2).n_bytes == junk.length)
    assert(metas(3).sample_rate == -1.0 && metas(3).n_bytes == 0)
  }

  test("decodeVideo parses real MP4 box structure; junk/truncation degrade to -1") {
    // hand-build a minimal faithful ISO BMFF file: ftyp + moov(mvhd v0 +
    // trak(tkhd v0)) with full-size payloads, exactly the byte layout a
    // muxer emits
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val mvhd = {
      val p = new java.io.ByteArrayOutputStream()
      p.write(be32(0))              // version 0 + flags
      p.write(be32(0)); p.write(be32(0)) // creation, modification
      p.write(be32(600))            // timescale
      p.write(be32(1800))           // duration -> 3.0 s
      p.write(new Array[Byte](80))  // rate..next_track (full v0 payload = 100)
      p.toByteArray
    }
    val tkhd = {
      val p = new java.io.ByteArrayOutputStream()
      p.write(be32(3))              // version 0 + flags (enabled|in-movie)
      p.write(be32(0)); p.write(be32(0)) // creation, modification
      p.write(be32(1))              // track id
      p.write(new Array[Byte](60))  // reserved..matrix (width lands at offset 76)
      p.write(be32(640L << 16))     // width, 16.16 fixed point
      p.write(be32(360L << 16))     // height
      p.toByteArray
    }
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    val junk = "certainly not an mp4 container".getBytes("UTF-8")
    val truncated = mp4.take(mp4.length / 2)
    val df = Seq((1L, mp4, "video/mp4"), (2L, junk, "text/plain"),
      (3L, truncated, "video/mp4"), (4L, null.asInstanceOf[Array[Byte]], "video/mp4"))
      .toDF("doc_id", "media", "media_type")
    val metas = Multimodal.decodeVideo(df).collect().sortBy(_.doc_id)
    assert(metas(0).brand == "isom" && metas(0).timescale == 600L)
    assert(math.abs(metas(0).duration_secs - 3.0) < 1e-9)
    assert(metas(0).width == 640.0 && metas(0).height == 360.0)
    // poison rows degrade, never NPE/kill the task
    assert(metas(1).timescale == -1L && metas(1).n_bytes == junk.length)
    assert(metas(2).timescale == -1L)
    assert(metas(3).timescale == -1L && metas(3).n_bytes == 0)
  }

  test("sampleFrames: frame grid from real mvhd duration; poison docs contribute zero frames") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    val mvhd = {
      val p = new java.io.ByteArrayOutputStream()
      p.write(be32(0)); p.write(be32(0)); p.write(be32(0))
      p.write(be32(600)); p.write(be32(1800))  // 3.0 s
      p.write(new Array[Byte](80))
      p.toByteArray
    }
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      box("moov", box("mvhd", mvhd))
    val df = Seq((1L, mp4, "video/mp4"),
      (2L, "junk".getBytes("UTF-8"), "text/plain"),
      (3L, null.asInstanceOf[Array[Byte]], "video/mp4"))
      .toDF("doc_id", "media", "media_type")
    // 2 fps over 3.0 s → frames at 0, 500, ..., 3000 ms = 7 frames
    val frames = Multimodal.sampleFrames(df, fps = 2.0).collect()
    assert(frames.forall(_.doc_id == 1L), "poison docs must contribute zero frames")
    assert(frames.length == 7)
    assert(frames.map(_.frame_ts_ms).sorted.toSeq ==
      Seq(0L, 500L, 1000L, 1500L, 2000L, 2500L, 3000L))
    assert(frames.forall(_.frame == null),
      "MP4 sample data has no pure-JVM codec - frames stay null")
    // the lying-duration bound: same video capped at 4 frames
    assert(Multimodal.sampleFrames(df, fps = 2.0, maxFramesPerDoc = 4)
      .collect().length == 4)
  }

  test("sampleFrames: MJPEG/AVI payloads carry REAL decodable frame bytes") {
    // 3 stored frames at 2 fps = 1.5 s: the grid includes the endpoint,
    // so 2 fps samples ts 0/500/1000/1500 (the last clamps to stored
    // frame 2); 1 fps samples ts 0/1000
    val avi = Multimodal.syntheticMjpegAvi(pattern = 3, flips = 1, noiseSeed = 9L)
    val df = Seq((1L, avi, "video/x-msvideo")).toDF("doc_id", "media", "media_type")
    val at2 = Multimodal.sampleFrames(df, fps = 2.0).collect().sortBy(_.frame_idx)
    assert(at2.length == 4)
    assert(at2.map(_.frame_ts_ms).toSeq == Seq(0L, 500L, 1000L, 1500L))
    assert(java.util.Arrays.equals(at2(2).frame, at2(3).frame),
      "past-the-end grid point clamps to the last stored frame")
    assert(at2.forall(_.frame != null), "AVI frames must be real bytes")
    // every emitted frame is a real JPEG javax.imageio can decode, and
    // hashes to the closed-form signature
    at2.foreach { fr =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.frame))
      assert(img != null && img.getWidth == 72 && img.getHeight == 64)
      assert(Multimodal.dHash64(fr.frame).contains(Multimodal.expectedVideoHash(3, 1)))
    }
    val at1 = Multimodal.sampleFrames(df, fps = 1.0).collect().sortBy(_.frame_idx)
    assert(at1.length == 2 && at1.map(_.frame_ts_ms).toSeq == Seq(0L, 1000L))
  }

  test("byteHistogramFeatures: exact normalized histogram, zero vector for empty") {
    val bytes = Array[Byte](0, 0, 0, 16, 16, -1, -1, -1) // bins 0(x3), 1(x2), 15(x3)
    val df = Seq((1L, bytes, "application/octet-stream"),
      (2L, Array.emptyByteArray, "application/octet-stream"),
      (3L, null.asInstanceOf[Array[Byte]], "application/octet-stream"))
      .toDF("doc_id", "media", "media_type")
    val out = Multimodal.byteHistogramFeatures(df, bins = 16).collect()
      .map(f => f.doc_id -> f.feature).toMap
    assert(out(1L).toSeq == Seq.tabulate(16)(i =>
      if (i == 0) 3f / 8 else if (i == 1) 2f / 8 else if (i == 15) 3f / 8 else 0f))
    assert(out(2L).toSeq == Seq.fill(16)(0f) && out(3L).toSeq == Seq.fill(16)(0f))
    // features feed the similarity surface: fixed width, finite values
    assert(out.values.forall(v => v.length == 16 && v.forall(x => !x.isNaN)))
  }

  test("ngramContamination flags partial leaks verbatim hashing misses") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "intro words then the secret eval question text here and a long tail"),
      (2L, "totally unrelated content about rivers and mountains flowing north today"),
      (3L, "the secret eval question text"), // exact eval copy
      (4L, "short doc"),                     // < n tokens: unflaggable
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the secret eval question text")).toDF("eval_id", "text")
    val got = Dedup.ngramContamination(corpus, col("doc_id"), col("text"),
      eval, col("eval_id"), col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 QUOTES the eval inside a larger page (verbatim digest join
    // would miss it); doc 3 is the exact copy; 2/4/5 are clean
    assert(got == Set((1L, 100L, 1L), (3L, 100L, 1L)), s"got $got")
    // minShared above the overlap suppresses the flag
    assert(Dedup.ngramContamination(corpus, col("doc_id"), col("text"),
      eval, col("eval_id"), col("text"), n = 5, minShared = 2L).count() == 0)
    // counts are DISTINCT shared grams: a doc repeating the eval twice
    // still shares exactly the eval's own gram set
    val rep = Seq((9L, "the secret eval question text and the secret eval question text"))
      .toDF("doc_id", "text")
    val r9 = Dedup.ngramContamination(rep, col("doc_id"), col("text"),
      eval, col("eval_id"), col("text"), n = 5).collect()
    assert(r9.length == 1 && r9(0).getLong(2) == 1L)
  }

  test("contamination finds every verbatim eval leak and nothing else") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated corpus document"),
      (3L, "the quick brown fox jumps over the lazy dog"), // second copy
      (4L, "the quick brown fox jumps over the lazy do"),  // near-miss: one char off
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "eval-only question never present in the corpus")).toDF("eid", "text")
    val hits = Dedup.contamination(corpus, col("doc_id"), col("text"),
        eval, col("eid"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 100L), (3L, 100L)))
  }

  test("deterministic sampling: partitioning-invariant, disjoint splits, sane rates") {
    import graft.operators.Sampling
    val df = spark.range(2000).select($"id")
    val a = Sampling.deterministicSample(df, $"id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(df.repartition(13), $"id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a == b) // membership is a function of the id, not the layout
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // growing the corpus never reassigns existing rows
    val grown = Sampling.deterministicSample(
      spark.range(4000).select($"id"), $"id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(grown))
    // splits partition the corpus with ~the requested weights
    val splits = Sampling.assignSplits(df, $"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == 2000L)
    assert(math.abs(splits("train") / 2000.0 - 0.8) < 0.05)
  }

  test("upsert: updates replace, new keys insert, others pass through") {
    val target = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "v")
    val updates = Seq((2, "b2", 99.0), (4, "d", 40.0)).toDF("k", "name", "v")
    val out = Upsert(target, updates, Seq("k")).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out == Map(1 -> ("a", 10.0), 2 -> ("b2", 99.0),
      3 -> ("c", 30.0), 4 -> ("d", 40.0)))
    // column order preserved; update schema may arrive permuted
    val permuted = Seq((99.0, 5, "e")).toDF("v", "k", "name")
    val out2 = Upsert(target, permuted, Seq("k"))
    assert(out2.columns.toSeq == Seq("k", "name", "v"))
    assert(out2.count() == 4)
  }

  test("streaming upsert: micro-batched updates merge into a partitioned colf table") {
    // The incremental-ingestion composition at scale: each arriving
    // micro-batch MERGEs into the live table (Upsert), and the merged
    // state lands via dynamic partition overwrite — only partitions the
    // batch touched are rewritten. Final table state must equal a
    // one-shot batch upsert of all updates.
    import java.nio.file.Files
    val dir = Files.createTempDirectory("stream_upsert_tbl").toString
    val inDir = Files.createTempDirectory("stream_upsert_in").toString
    Seq((1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 1))
      .toDF("k", "v", "p")
      .write.format("colf").option("partitionBy", "p").mode("overwrite").save(dir)
    // two micro-batches: an update in p=0, an insert in p=1, then an
    // update of the batch-1 insert (cross-batch chaining)
    Seq((2, "b2", 0), (5, "e", 1)).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(inDir)
    Seq((5, "e2", 1)).toDF("k", "v", "p")
      .coalesce(1).write.mode("append").parquet(inDir)

    val mode = "spark.sql.sources.partitionOverwriteMode"
    val oldMode = spark.conf.get(mode)
    spark.conf.set(mode, "dynamic")
    try {
      val q = spark.readStream.schema("k INT, v STRING, p INT").parquet(inDir)
        .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (delta: org.apache.spark.sql.DataFrame, _: Long) =>
          val current = spark.read.format("colf").load(dir)
          val touched = delta.select("p").distinct()
          val merged = Upsert(current, delta, Seq("k"))
            .join(broadcast(touched), Seq("p"), "left_semi")
          merged.select("k", "v", "p") // partition col must come through
            .write.format("colf").option("partitionBy", "p")
            .mode("overwrite").save(dir)
          ()
        }.start()
      q.awaitTermination()
    } finally spark.conf.set(mode, oldMode)

    val fin = spark.read.format("colf").load(dir)
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(fin == Map(1 -> ("a", 0), 2 -> ("b2", 0), 3 -> ("c", 1),
      4 -> ("d", 1), 5 -> ("e2", 1)))
  }

  test("removeDuplicateSpans erases repeated n-grams except the first occurrence") {
    val docs = Seq(
      (1, "one two three four five six seven eight tailA"),
      (2, "zero one two three four five six seven eight tailB"),
      (3, "totally unrelated words that never repeat anywhere at all"),
      // internal repetition: an 8-token phrase repeated back to back
      (4, "p q r s t u v w p q r s t u v w"),
      (5, "short doc"),
      (6, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, $"doc_id", $"text", n = 8)
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1), r.getInt(2), r.getInt(3)))).toMap

    // doc 1 owns the global first occurrence of the shared 8-gram: untouched
    assert(out(1) == (("one two three four five six seven eight tailA", 9, 0)))
    // doc 2's copy at pos 1 is a loser: those 8 tokens vanish, rest survives
    assert(out(2) == (("zero tailB", 10, 8)))
    assert(out(3)._3 == 0)
    // periodic doc: every gram (i, i+8) pair duplicates; the second period
    // is covered by spans starting at 8..8 (losers), first 8 tokens stay
    assert(out(4) == (("p q r s t u v w", 16, 8)))
    // < n tokens: no grams, untouched
    assert(out(5) == (("short doc", 2, 0)))
    // null text passes through
    assert(out(6) == ((null, 0, 0)))
  }

  test("normalizeForDedup collapses case/punct/whitespace variants to one key") {
    val df = Seq(
      (1, "The quick brown fox."),
      (2, "THE QUICK   BROWN FOX!!!"),
      (3, "  the, quick; brown... fox  "),
      (4, "a different document"),
      (5, null.asInstanceOf[String])).toDF("id", "text")
    val keyed = df.select($"id", TextAnalysis.normalizeForDedup($"text").as("k"))
    val byKey = keyed.where($"k".isNotNull).groupBy("k")
      .agg(count(lit(1)).as("n"), min("id").as("first")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(keyed.where($"id" === 1).head.getString(1) == "the quick brown fox")
    assert(byKey("the quick brown fox") == (3L, 1))
    assert(byKey("a different document") == (1L, 4))
    // null text stays null (never groups with the empty string)
    assert(keyed.where($"id" === 5).head.isNullAt(1))
    // digits survive; only punctuation folds
    val d = Seq("v2.0-beta  build 7").toDF("text")
      .select(TextAnalysis.normalizeForDedup($"text")).head.getString(0)
    assert(d == "v2 0 beta build 7")
  }

  test("repetitionStats: duplicate-token and top-token ratios on known docs") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a a a a"),            // 4 tokens, 1 distinct: dup 0.75, top 1.0
      (2L, "a b c d"),            // all distinct: dup 0.0, top 0.25
      (3L, "spam spam ham eggs"), // dup 0.25, top 0.5
      (4L, null.asInstanceOf[String])) // null text → no row
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, $"doc_id", $"text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(r(1L) == ((4L, 1L, 0.75, 1.0)))
    assert(r(2L) == ((4L, 4L, 0.0, 0.25)))
    assert(r(3L) == ((4L, 3L, 0.25, 0.5)))
  }

  test("leakageSafeSplits: every dup-cluster member shares one split; singletons match assignSplits") {
    import graft.operators.Sampling
    // 90 docs; ids 0..29 pair into 15 two-doc clusters (edges i -> i+30);
    // ids 60..89 are singletons.
    val df = spark.range(90).select($"id")
    val edges = spark.range(30).select($"id".as("id_a"), ($"id" + 30).as("id_b"))
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.leakageSafeSplits(df, $"id", edges, w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size == 90)
    // cluster members agree on component AND split
    for (i <- 0L until 30L) {
      assert(out(i)._1 == i && out(i + 30)._1 == i, s"pair $i component")
      assert(out(i)._2 == out(i + 30)._2, s"pair $i split leaks across eval boundary")
    }
    // singletons behave exactly like plain per-id assignSplits
    val plain = Sampling.assignSplits(df.where($"id" >= 60), $"id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (i <- 60L until 90L) assert(out(i) == ((i, plain(i))))
    // all three splits are populated at this n
    assert(out.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("sampleToBudget: within budget, prefix-closed, partitioning-invariant") {
    import graft.operators.Sampling
    val df = spark.range(500).select($"id", ($"id" % 97 + 5).as("cost"))
    def run(budget: Long, parts: Int) =
      Sampling.sampleToBudget(df.repartition(parts), $"id", $"cost", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val small = run(3000, 4)
    val big = run(9000, 4)
    assert(small.nonEmpty && small.map(_._2).sum <= 3000)
    assert(big.map(_._2).sum <= 9000)
    // prefix-closed: a bigger budget only ADDS rows
    assert(small.map(_._1).toSet.subsetOf(big.map(_._1).toSet))
    assert(small.toSet.subsetOf(big.toSet)) // cum values identical too
    // partitioning cannot move the cut
    assert(run(3000, 13) == small)
    // degenerate budgets
    assert(run(0, 4).isEmpty)
  }

  test("capPerGroupBudget: per-group bounds, prefix-closed, agrees with global form on one group") {
    import graft.operators.Sampling
    val df = spark.range(600).select($"id",
      concat(lit("g"), ($"id" % 3).cast("string")).as("grp"),
      ($"id" % 53 + 7).as("cost"))
    def run(budget: Long) = Sampling.capPerGroupBudget(df, $"grp", $"id", $"cost", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val small = run(2000)
    val big = run(6000)
    // every group's kept total respects ITS budget
    for ((g, rows) <- small.groupBy(_._1)) {
      assert(rows.map(_._3).sum <= 2000, s"group $g exceeds budget")
      assert(rows.nonEmpty, s"group $g empty at this budget")
    }
    // prefix-closed per group: bigger budget only adds rows, cum unchanged
    assert(small.toSet.subsetOf(big.toSet))
    // one-group input == the global sampleToBudget (same priority, same cut)
    val one = df.where($"grp" === "g0")
    val grouped = Sampling.capPerGroupBudget(one, $"grp", $"id", $"cost", 2000)
      .select("id", "cost", "cum").collect().map(_.toString).sorted.toSeq
    val global = Sampling.sampleToBudget(one, $"id", $"cost", 2000)
      .collect().map(_.toString).sorted.toSeq
    assert(grouped == global)
  }

  test("capPerKeyWindow keeps first n per (key,bucket) by strict order; partitioning-invariant") {
    import graft.operators.Sampling
    // key 1: five events in bucket 0 (two tie at tus=5 → eid orders them),
    // one in bucket 1; key 2: one event
    val df = Seq((1L, 5L, 1L), (1L, 5L, 2L), (1L, 3L, 3L), (1L, 7L, 4L),
      (1L, 9L, 5L), (1L, 15L, 6L), (2L, 1L, 7L)).toDF("k", "tus", "eid")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.capPerKeyWindow(d, $"k", $"tus", $"eid", windowMicros = 10L, n = 2)
        .select("k", "eid", "bucket", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    val out = run(df)
    // bucket 0 of key 1 keeps tus=3 (rn1) then the tus=5/eid=1 tie-winner (rn2)
    assert(out == Seq((1L, 1L, 0L, 2), (1L, 3L, 0L, 1), (1L, 6L, 1L, 1), (2L, 7L, 0L, 1)))
    assert(run(df.repartition(7)) == out)
  }

  test("temporalSplit: time-prefix train, embargo band dropped, eval after") {
    import graft.operators.Sampling
    // tus 0..1000 → cut = 700; embargo 100 drops [700, 800)
    val df = spark.range(1001).select($"id", $"id".as("tus"))
    val out = Sampling.temporalSplit(df, $"tus", trainPermille = 700,
      embargoMicros = 100L).select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.size == 901)                       // 100 embargo rows dropped
    assert(out(699L) == "train" && !out.contains(700L))
    assert(!out.contains(799L) && out(800L) == "eval" && out(1000L) == "eval")
    // permille 0 → everything from t0+embargo on is eval, nothing train
    val all = Sampling.temporalSplit(df, $"tus", 0, 0L)
      .groupBy("split").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(all == Map("eval" -> 1001L))
  }

  test("stratified sample and per-group cap are deterministic and bounded") {
    import graft.operators.Sampling
    val df = spark.range(3000)
      .select($"id", concat(lit("g"), ($"id" % 3).cast("string")).as("grp"))
    // per-stratum rates hold and membership matches the flat sample of the
    // same fraction (the stratum only picks the threshold)
    val strat = Sampling.stratifiedSample(df, $"id", $"grp",
      Map("g0" -> 0.2, "g1" -> 1.0), defaultFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byGrp = strat.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("g1") == 1000, "fraction 1.0 must keep the whole stratum")
    assert(math.abs(byGrp("g0") / 1000.0 - 0.2) < 0.06)
    assert(math.abs(byGrp("g2") / 1000.0 - 0.5) < 0.06)
    val flat20 = Sampling.deterministicSample(df.where($"grp" === "g0"), $"id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(strat.filter(_._2 == "g0").map(_._1).toSet == flat20)

    // cap: exactly n survivors per group, invariant to partitioning
    val capped = Sampling.capPerGroup(df, $"grp", $"id", n = 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(capped.groupBy(_._2).view.mapValues(_.length).toMap.values.forall(_ == 7))
    val capped13 = Sampling.capPerGroup(df.repartition(13), $"grp", $"id", n = 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(capped.toSet == capped13.toSet)
    // a group smaller than the cap survives whole
    val tiny = Sampling.capPerGroup(df.where($"id" < 5), $"grp", $"id", n = 7).count()
    assert(tiny == 5)
    // the rank-≤-n filter is pushed map-side (bounded shuffle)
    val plan = Sampling.capPerGroup(df, $"grp", $"id", n = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("resizeImages rescales real images; junk payloads become null media") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def img(w: Int, h: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      ImageIO.write(new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), "png", b)
      b.toByteArray
    }
    val df = Seq((1L, img(200, 100), "image/png"), (2L, "junk".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "media", "media_type")
    val out = Multimodal.resizeImages(df, 64, 32).collect().sortBy(_.doc_id)
    val resized = ImageIO.read(new java.io.ByteArrayInputStream(out(0).media))
    assert(resized.getWidth == 64 && resized.getHeight == 32)
    assert(out(0).media_type == "image/png")
    assert(out(1).media == null && out(1).media_type == "text/plain")
  }

  test("vec_dot registers as a SQL function; extensions hook applies cleanly") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) == 11.0)
    // ragged arrays → null, matching the DataFrame-side semantics
    assert(spark.sql("SELECT vec_dot(array(1.0d), array(1.0d, 2.0d)) AS d")
      .collect()(0).isNullAt(0))
    // the lifted text operators answer through SQL exactly like their
    // DataFrame forms (same Column composition underneath)
    val r = spark.sql(
      """SELECT token_count('a b c') AS n,
        |  lang_id('the quick brown fox is happy and it was fun') AS l,
        |  redact_pii('mail bob@ex.io now') AS red,
        |  quality_score('') AS q0""".stripMargin).collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "en")
    assert(r.getString(2) == "mail <EMAIL> now")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(spark.sql("SELECT doc_fingerprint('x') AS f").collect()(0).getLong(0) ==
      spark.range(1).select(TextAnalysis.fingerprint(lit("x"))).collect()(0).getLong(0))
    assert(spark.sql("SELECT normalize_dedup('  The, QUICK   fox!! ') AS n")
      .collect()(0).getString(0) == "the quick fox")
    // table-valued functions: snapshot + incremental reads from pure SQL
    locally {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("tvf_colf").toString
      Seq((1, "a")).toDF("k", "v").write.format("colf")
        .option("manifest", "true").mode("append").save(dir)
      Seq((2, "b"), (3, "c")).toDF("k", "v").write.format("colf")
        .mode("append").save(dir)
      assert(spark.sql(s"SELECT count(*) FROM colf_snapshot('$dir', 1)")
        .as[Long].head() == 1L)
      assert(spark.sql(s"SELECT k FROM colf_changes('$dir', 1) ORDER BY k")
        .as[Int].collect().toSeq == Seq(2, 3))
      // TVFs compose with ordinary SQL (joins, filters)
      assert(spark.sql(
        s"""SELECT c.k FROM colf_changes('$dir', 1) c
           |JOIN colf_snapshot('$dir', 2) s ON c.k = s.k
           |WHERE c.k > 2""".stripMargin).as[Int].collect().toSeq == Seq(3))
      // non-literal / bad args fail at analysis, loudly
      val bad = intercept[Exception] {
        spark.sql(s"SELECT * FROM colf_snapshot('$dir', 'notanumber')").collect()
      }
      assert(bad.getMessage.contains("version"))
      // observability TVFs: per-file metadata and snapshot history as rows
      val files = spark.sql(
        s"SELECT path, num_rows FROM colf_files('$dir') ORDER BY path").collect()
      assert(files.nonEmpty && files.map(_.getLong(1)).sum == 3L)
      assert(files.forall(_.getString(0).endsWith(".colf")))
      val vers = spark.sql(
        s"""SELECT version, num_files, operation, num_rows, committed_at
           |FROM colf_versions('$dir')
           |ORDER BY version""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      assert(vers.map(_._1).toSeq == Seq(1L, 2L))
      assert(vers.last._2 > vers.head._2) // the append grew the file set
      // DESCRIBE-HISTORY facts: the committing operation, exact live row
      // counts, and the EMBEDDED commit time (manifest ts, not mtime)
      assert(vers.map(_._3).toSeq == Seq("append", "append"))
      assert(vers.map(_._4).toSeq == Seq(1L, 3L))
      assert(vers.forall(_._5 > 1700000000000L))
      val unversioned = intercept[Exception] {
        val d2 = java.nio.file.Files.createTempDirectory("tvf_unver").toString
        Seq((1, "a")).toDF("k", "v").write.format("colf").mode("append").save(d2)
        spark.sql(s"SELECT * FROM colf_versions('$d2')").collect()
      }
      assert(unversioned.getMessage.contains("not a versioned table"))
      // row-level snapshot diff from SQL: v1 {1} → latest {1,2,3} means
      // rows 2 and 3 tagged 'added', nothing 'removed'
      val diff = spark.sql(
        s"""SELECT k, change FROM colf_diff('$dir', 1) ORDER BY k""")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      assert(diff.toSeq == Seq((2, "added"), (3, "added")))
      // explicit to-version: v1 → v1 is an empty diff
      assert(spark.sql(s"SELECT * FROM colf_diff('$dir', 1, 1)").count() == 0)
    }
    // the cluster-wide SparkSessionExtensions entry point is constructible
    // by name (as spark.sql.extensions would) and applies without error
    val ext = Class.forName("graft.GraftExtensions").getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions())
  }

  test("codegen DotProductInt: exact long dot, null/raggedness contract, SQL registry") {
    val df = Seq(
      (1L, Array(127, -127, 50), Array(127, 127, 2)),
      (2L, Array(1, 2, 3), Array(4, 5, 6))
    ).toDF("id", "a", "b")
    val out = df.select($"id", graft.functions.VectorFunctions.vecDotInt($"a", $"b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 127*127 - 127*127 + 100 = 100; 4 + 10 + 18 = 32
    assert(out == Map(1L -> 100L, 2L -> 32L))
    // int32-overflowing components accumulate exactly in the long
    val big = Seq((Array(2000000000, 2000000000), Array(2, 2))).toDF("a", "b")
    assert(big.select(graft.functions.VectorFunctions.vecDotInt($"a", $"b"))
      .collect()(0).getLong(0) == 8000000000L)
    // null array, null element, ragged lengths -> null
    val n = Seq(
      (Some(Array(1, 2)), None: Option[Array[Int]]),
      (Some(Array(1, 2)), Some(Array(1, 2, 3)))
    ).toDF("a", "b")
    assert(n.select(graft.functions.VectorFunctions.vecDotInt($"a", $"b"))
      .collect().forall(_.isNullAt(0)))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vdi_sql")
    assert(spark.sql("SELECT vec_dot_int(a, b) FROM vdi_sql WHERE id = 2")
      .collect()(0).getLong(0) == 32L)
  }

  test("codegen DotProduct is bit-identical to the sequential fold") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 200).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
      .toDF("id", "a", "b")
    val both = df.select(
      graft.functions.VectorFunctions.vecDot($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("fold"))
    val rows = both.collect()
    assert(rows.forall(r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    // null propagation: null ARRAY and null ELEMENT both poison the result,
    // exactly like the fold (zip_with's null product nulls the aggregate)
    val n = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    assert(n.select(graft.functions.VectorFunctions.vecDot($"a", $"b")).collect()(0).isNullAt(0))
    val ne = spark.sql("SELECT array(1.0d, NULL) AS a, array(2.0d, 3.0d) AS b")
    val r2 = ne.select(
      graft.functions.VectorFunctions.vecDot($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("fold"))
      .collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("minhash ignores null-text documents instead of flooding band buckets") {
    val df = Seq((1L, Option("alpha beta gamma delta epsilon zeta")),
      (2L, Option("alpha beta gamma delta epsilon eta")),
      (3L, None), (4L, None), (5L, None)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, $"doc_id", $"text",
        Dedup.MinHashParams(jaccardThreshold = 0.3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L))
  }

  test("hashedLinearScore: deterministic, map-only, sane edges") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, ""), (4L, "zzz")).toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(df, $"doc_id", $"text",
      dim = 64, seed = 7L)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3))).toMap
    // identical text ⇒ identical score (hashing is the only "model")
    assert(rows(1L) == rows(2L))
    assert(rows(1L)._1 == 3)
    // empty document: zero tokens, zero score, dropped
    assert(rows(3L) == ((0, 0.0, false)))
    // score bounded by construction: mean of ±0.5-uniform weights
    assert(rows.values.forall(v => math.abs(v._2) <= 0.5))
    // map-only plan: no exchange anywhere — the property that makes the
    // scorer run at scan bandwidth on 100 TB
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // threshold sidedness
    val kept = TextAnalysis.hashedLinearScore(df, $"doc_id", $"text",
      dim = 64, seed = 7L, threshold = -1.0).collect()
    assert(kept.forall(_.getBoolean(3))) // every score clears -1
  }

  // ------------------------------------------------------- multimodal

  test("multimodal stub decode: plumbing carries bytes and derives meta") {
    val docs = Seq((7L, "hello")).toDF("doc_id", "text")
    val meta = Multimodal.decodeStub(Multimodal.toMediaTable(docs)).collect()(0)
    assert(meta.doc_id == 7L && meta.n_bytes == 5 &&
      meta.width == 5 && meta.height == 5 && meta.checksum == 5L * 2654435761L)
  }
}
