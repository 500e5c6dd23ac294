package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The exact-duplicate pre-grouping guard in MinHash/SimHash near-dup
  * (VERDICT r2 #3): identical texts enter banding once, so a corpus of
  * millions of copies cannot blow up the candidate self-join; expansion
  * restores the exact ungrouped output.
  */
class DedupGroupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val p = Dedup.MinHashParams(bands = 8, rowsPerBand = 4, jaccardThreshold = 0.4)

  test("incrementalDedup: exact / near / novel tiers, flood guard, determinism") {
    val corpus = Seq(
      (1L, "spark reads the columnar table and scans only the blocks it needs for the plan"),
      (2L, "a totally different corpus document about distributed join strategies and shuffles"),
      (3L, "spark reads the columnar table and scans only the blocks it needs for the plan"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank at dawn today"),
    ).toDF("doc_id", "text")
    val delta = Seq(
      // verbatim copy of docs 1/3 -> exact, matched to the SMALLEST id (1)
      (100L, "spark reads the columnar table and scans only the blocks it needs for the plan"),
      // one-word edit of doc 4 -> near
      (101L, "the quick brown fox jumps over the lazy dog near the river bank at dusk today"),
      // nothing like the corpus -> novel
      (102L, "cooking pasta with fresh basil tomato sauce and a pinch of sea salt tonight"),
      // exact-dup FLOOD in the delta: all collapse to one banding rep
      (103L, "the quick brown fox jumps over the lazy dog near the river bank at dusk today"),
      (104L, "the quick brown fox jumps over the lazy dog near the river bank at dusk today"),
      // null text -> novel
      (105L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedup(corpus, col("doc_id"), col("text"),
        delta, col("doc_id"), col("text"), p)
      .orderBy("id")
      .collect()
      .map(x => (x.getLong(0), x.getString(1), Option(x.get(2)), x.isNullAt(3)))
    assert(r.map(t => t._1 -> t._2).toSeq == Seq(
      100L -> "exact", 101L -> "near", 102L -> "novel",
      103L -> "near", 104L -> "near", 105L -> "novel"))
    assert(r(0)._3.contains(1L))                      // smallest exact match id
    assert(Seq(1, 3, 4).forall(i => r(i)._3.contains(4L))) // near matches doc 4
    assert(r(2)._3.isEmpty && r(5)._3.isEmpty)        // novel: null matched_id
    assert(r(2)._4 && r(5)._4)                        // novel: null jaccard
    // statuses are a partition of the delta: one row per delta doc
    assert(r.length == 6)
  }

  test("10k identical docs enter banding as ONE row; candidates stay linear") {
    val boiler = "the same boilerplate legal disclaimer text appears on every single page of this site"
    val docs = ((0L until 10000L).map(i => (i, boiler)) ++ Seq(
      (20001L, "completely unrelated text about mountains and rivers flowing north"),
      (20002L, "another distinct document discussing compilers and type systems")))
      .toDF("doc_id", "text")
    val clean = docs.select(col("doc_id").as("id"), col("text").as("__text"))
    val (members, reps) = Dedup.fingerprintGroups(clean)
    assert(members.count() == 10002)
    assert(reps.count() == 3) // 10k identical → 1 representative
    assert(reps.where(col("__text") === boiler).select("id").as[Long].head() == 0L)
    // the stage that used to be quadratic: candidates among 3 reps, not
    // 10002 docs — the old pipeline would have pushed ~8×C(10k,2) ≈ 4×10⁸
    // pairs through the band join and verification here
    val sigs = Dedup.minhashSignatures(reps, col("id"), col("__text"), p)
    val nCands = Dedup.minhashCandidates(sigs, p).count()
    assert(nCands <= 3, s"candidate stage should be over reps only, got $nCands pairs")
  }

  // ------------------------------------------------------------------
  // Equivalence: the grouped pipelines reproduce the ungrouped outputs
  // exactly. The references below are the pre-guard implementations.

  private def oldMinhash(df: DataFrame, p: Dedup.MinHashParams): DataFrame = {
    val clean = df.where(col("text").isNotNull)
    val sigs = Dedup.minhashSignatures(clean, col("doc_id"), col("text"), p)
    val cands = Dedup.minhashCandidates(sigs, p)
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id"))).distinct()
    val shingled = clean.select(col("doc_id").as("id"), col("text").as("__t"))
      .join(candIds, "id")
      .select(col("id"), Dedup.shingleUdf(p.shingleSize)(col("__t")).as("sh"))
    cands
      .join(shingled.toDF("id_a", "sh_a"), "id_a")
      .join(shingled.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= p.jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  private def pairSet(df: DataFrame) = df.collect().map { r =>
    (r.getLong(0), r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)))
  }.toSet

  test("grouped minhash == ungrouped minhash on a corpus with many exact dups") {
    val near1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val near2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val docs = (
      (0L until 40L).map(i => (i, "duplicated boilerplate text shared by many documents verbatim body")) ++
      Seq((100L, near1), (101L, near2),
        (102L, "totally different content about databases and storage engines"),
        (103L, null.asInstanceOf[String]))
    ).toDF("doc_id", "text")
    val fast = pairSet(Dedup.minhashNearDups(docs, col("doc_id"), col("text"), p))
    val ref = pairSet(oldMinhash(docs, p))
    assert(fast == ref)
    // sanity on shape: C(40,2)=780 intra pairs at jaccard 1.0 + the planted pair
    assert(fast.count { case (a, b, _) => a < 40 && b < 40 } == 780)
    assert(fast.forall { case (a, b, _) => a < b })
    assert(fast.exists { case (a, b, j) =>
      a == 100L && b == 101L && java.lang.Double.longBitsToDouble(j) < 1.0 })
  }

  test("grouped simhash == ungrouped simhash, intra pairs at hamming 0") {
    val docs = (
      (0L until 25L).map(i => (i, "identical tokens flow through the simhash voting stage here")) ++
      Seq((100L, "identical tokens flow through the simhash voting stage there"),
        (101L, "wholly different words about orchestras and violins playing music"))
    ).toDF("doc_id", "text")
    def oldSimhash(df: DataFrame, maxHamming: Int): DataFrame = {
      val nChunks = maxHamming + 1
      val width = 64 / nChunks
      val mask = (1L << width) - 1L
      val withSim = df.where(col("text").isNotNull)
        .select(col("doc_id").as("id"), Dedup.simhash64("text").as("sim"))
      val chunkCols = (0 until nChunks).map { j =>
        struct(lit(j).as("chunk"),
          shiftrightunsigned(col("sim"), j * width).bitwiseAND(lit(mask)).as("ckey"))
      }
      val chunks = withSim.select(col("id"), col("sim"), explode(array(chunkCols: _*)).as("c"))
        .select(col("id"), col("sim"), col("c.chunk"), col("c.ckey"))
      val l = chunks.toDF("id_a", "sim_a", "chunk", "ckey")
      val r = chunks.toDF("id_b", "sim_b", "chunk", "ckey")
      l.join(r, Seq("chunk", "ckey")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .where(col("hamming") <= maxHamming)
        .distinct()
    }
    def hset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fast = hset(Dedup.simhashNearDups(docs, col("doc_id"), col("text"), maxHamming = 3))
    val ref = hset(oldSimhash(docs, 3))
    assert(fast == ref)
    assert(fast.count { case (a, b, h) => a < 25 && b < 25 && h == 0 } == 300) // C(25,2)
  }

  // --------------------------------------------- embedding-cosine near-dup

  private def vecCorpus(): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(31)
    def v() = Array.fill(8)(rnd.nextGaussian().toFloat)
    val base = (0L until 30L).map(i => (i, v()))
    val dupVec = base(3)._2
    val nearVec = base(5)._2.clone()
    nearVec(0) = nearVec(0) + 0.01f // tiny perturbation: cos ≈ 1
    (base ++ Seq((100L, dupVec), (101L, dupVec), (102L, nearVec)))
      .toDF("vec_id", "embedding")
  }

  private def cosSet(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
    (r.getLong(0), r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)))
  }.toSet

  test("cosine LSH with planesPerBand=0 degenerates to the exact all-pairs result") {
    val df = vecCorpus()
    val exact = cosSet(Dedup.cosineNearDups(df, col("vec_id"), col("embedding"), 0.6))
    val degenerate = cosSet(Dedup.cosineNearDupsLSH(df, col("vec_id"), col("embedding"), 0.6,
      bands = 2, planesPerBand = 0, dim = 8))
    assert(degenerate == exact)
    assert(exact.nonEmpty)
    // identical vectors pair up through the fingerprint guard, with the
    // same computed self-cosine the exact path produces
    assert(exact.exists { case (a, b, _) => a == 100L && b == 101L })
    assert(exact.exists { case (a, b, _) => a == 3L && b == 100L })
  }

  test("connectedComponents: chains, cliques, singletons, convergence") {
    import Dedup.{assignClusters, connectedComponents}
    // a 5-chain (diameter 4), a triangle, and an isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comps = connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comps(_) == 1L))
    assert((10L to 12L).forall(comps(_) == 10L))
    assert(comps(20L) == 20L && comps(21L) == 20L)
    // corpus-level assignment: ids without edges are their own component
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("vec_id", "x")
    val assigned = assignClusters(docs, col("vec_id"), Seq((1L, 2L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 6L))
  }

  test("connectedComponents: diameter-30 chain converges correctly (beyond min-propagation's round cap)") {
    import Dedup.connectedComponents
    // A 31-node path — diameter 30. Min-label propagation at the default
    // maxIter=20 would have SILENTLY returned partial labels here (the r3
    // latent wrong-answer path); large-star/small-star needs O(log n)
    // rounds, so the default cap is ample. Edge order shuffled and ids
    // descending-biased so nothing depends on input layout.
    val chain = scala.util.Random.shuffle((0L until 30L).map(i => (i + 1L, i)).toList)
      .toDF("id_a", "id_b")
    // driverMaxEdges = 0 forces the distributed rounds — this test exists
    // to pin THEIR convergence; the driver fast path would short-circuit it
    val comps = connectedComponents(chain, driverMaxEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 31)
    assert((0L to 30L).forall(comps(_) == 0L), s"chain must collapse to component 0, got $comps")
  }

  test("connectedComponents: throws on maxIter without fixpoint instead of silent partial labels") {
    import Dedup.connectedComponents
    val chain = (0L until 30L).map(i => (i, i + 1L)).toDF("id_a", "id_b")
    // force the distributed path: the round cap is its safety property
    val e = intercept[IllegalStateException](
      connectedComponents(chain, maxIter = 1, driverMaxEdges = 0))
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents matches a union-find reference on a random graph") {
    import Dedup.connectedComponents
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // local union-find ground truth with min-id labels
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    val got = connectedComponents(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("connectedComponents: driver fast path and distributed rounds emit identical labels") {
    import Dedup.connectedComponents
    // The small-graph collect+union-find path (default gate) must be
    // bit-identical to the large-star/small-star rounds on the same input —
    // including self-loops (singleton components) and duplicate edges.
    val rnd = new scala.util.Random(13)
    val edges = (Seq.fill(300)((rnd.nextInt(250).toLong, rnd.nextInt(250).toLong)) ++
      Seq((400L, 400L), (1L, 2L), (1L, 2L))).toDF("id_a", "id_b")
    val fast = connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = connectedComponents(edges, driverMaxEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, "driver fast path diverged from the distributed rounds")
    assert(fast(400L) == 400L, "self-loop-only node must be its own singleton component")
  }

  test("clusters over MinHash pairs == clusters over exact pairs when LSH recall is 1.0") {
    // The q_dedup_clusters_lsh composition (minhashNearDups →
    // assignClusters) end-to-end. Planted EXACT duplicate groups at a high
    // threshold: identical texts have identical signatures, so every true
    // pair survives banding deterministically (recall 1.0), and wholly
    // distinct docs share no shingles, so verification kills any stray
    // band collision (precision is exact either way). Clusters over the
    // LSH pairs must therefore equal clusters over exact all-pairs
    // Jaccard edges.
    val groupTexts = Seq(
      "first planted duplicate group body with enough distinct tokens to shingle",
      "second planted group entirely different vocabulary about glaciers and moraines",
      "third planted group discussing queue theory arrival rates and service times")
    val docs = (
      groupTexts.zipWithIndex.flatMap { case (txt, g) =>
        (0 until 4).map(i => (g * 100L + i, txt)) } ++
      Seq((900L, "a singleton document with its own unique content and tokens"),
        (901L, null.asInstanceOf[String]))
    ).toDF("doc_id", "text")
    val hp = Dedup.MinHashParams(bands = 8, rowsPerBand = 4, jaccardThreshold = 0.9)
    val lshPairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"), hp)
      .select("id_a", "id_b")
    // exact ground-truth edges: all-pairs token-set Jaccard, locally
    val toks = docs.where(col("text").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').toSet)
    val exactPairs = (for {
      (a, ta) <- toks; (b, tb) <- toks if a < b
      j = (ta & tb).size.toDouble / (ta | tb).size
      if j >= 0.9
    } yield (a, b)).toSeq.toDF("id_a", "id_b")
    def clusters(edges: DataFrame) =
      Dedup.assignClusters(docs, col("doc_id"), edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLsh = clusters(lshPairs)
    val viaExact = clusters(exactPairs)
    assert(viaLsh == viaExact)
    // and the clusters are the planted ones: each group collapses to its min id
    (0 until 3).foreach { g =>
      (0 until 4).foreach(i => assert(viaLsh(g * 100L + i) == g * 100L)) }
    assert(viaLsh(900L) == 900L)
  }

  test("minhashClusters == assignClusters(minhashNearDups) without the pair surface (r20)") {
    // The scale-correct clustering path must label IDENTICALLY to the
    // pair-surface composition on every row class: exact-dup groups
    // (members inherit through the fingerprint map), NEAR-dup groups
    // (rep-level components bridge fingerprint groups), chained
    // near-dups (transitivity through components), singletons, and
    // null-text rows (label themselves).
    val base = "planted near duplicate group body with plenty of distinct tokens to shingle cleanly"
    val docs = (
      // exact-dup group of 5 (ids 0-4) + a NEAR variant group of 3 (ids 10-12)
      (0 until 5).map(i => (i.toLong, base)) ++
      (0 until 3).map(i => (10L + i, base + " tail")) ++
      // a chain: 20 ~ 21 via another shared body
      Seq((20L, "glacier moraine drumlin esker outwash plain kettle lake terminal ridge sequence"),
        (21L, "glacier moraine drumlin esker outwash plain kettle lake terminal ridge sequence extra"),
        (900L, "a singleton document with its own unique content and tokens entirely"),
        (901L, null.asInstanceOf[String]))
    ).toDF("doc_id", "text")
    val p = Dedup.MinHashParams(bands = 16, rowsPerBand = 2, jaccardThreshold = 0.6)
    val viaPairs = Dedup.assignClusters(docs, col("doc_id"),
        Dedup.minhashNearDups(docs, col("doc_id"), col("text"), p).select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Dedup.minhashClusters(docs, col("doc_id"), col("text"), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == viaPairs)
    // the planted structure resolved: exact+near groups merged to min id 0
    assert((0 until 5).forall(i => direct(i.toLong) == 0L))
    assert((10L to 12L).forall(direct(_) == 0L))
    assert(direct(21L) == 20L && direct(20L) == 20L)
    assert(direct(900L) == 900L && direct(901L) == 901L)
  }

  test("jaccardClusters (oracle twin) == minhashClusters on planted corpora (r21)") {
    // The recall-1.0 verification twin behind q_dedup_clusters_exact:
    // same grouping, threshold, components and labels with an explicit
    // all-pairs exact-Jaccard candidate stage. On corpora whose true
    // pairs the banding finds (exact-dup groups collide in every band;
    // the near/chain corpus below is deterministic under the fixed
    // seed), the two must label identically — this is the bridge that
    // lets the SQL oracle's check of the exact twin stand in for the
    // oracle-blind LSH query.
    val base = "planted near duplicate group body with plenty of distinct tokens to shingle cleanly"
    val docs = (
      (0 until 5).map(i => (i.toLong, base)) ++
      (0 until 3).map(i => (10L + i, base + " tail")) ++
      Seq((20L, "glacier moraine drumlin esker outwash plain kettle lake terminal ridge sequence"),
        (21L, "glacier moraine drumlin esker outwash plain kettle lake terminal ridge sequence extra"),
        (900L, "a singleton document with its own unique content and tokens entirely"),
        (901L, null.asInstanceOf[String]))
    ).toDF("doc_id", "text")
    val p = Dedup.MinHashParams(bands = 16, rowsPerBand = 2, jaccardThreshold = 0.6)
    val viaLsh = Dedup.minhashClusters(docs, col("doc_id"), col("text"), p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExact = Dedup.jaccardClusters(docs, col("doc_id"), col("text"),
        minJaccard = 0.6, shingleSize = p.shingleSize)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExact == viaLsh)
    assert((0 until 5).forall(i => viaExact(i.toLong) == 0L))
    assert(viaExact(901L) == 901L)
  }

  test("cosine LSH with real parameters is an exact-precision subset that finds planted dups") {
    val df = vecCorpus()
    val exact = cosSet(Dedup.cosineNearDups(df, col("vec_id"), col("embedding"), 0.9))
    val lsh = cosSet(Dedup.cosineNearDupsLSH(df, col("vec_id"), col("embedding"), 0.9,
      bands = 8, planesPerBand = 4, dim = 8))
    assert(lsh.subsetOf(exact)) // verification keeps precision exact
    // near-identical vectors (θ ≈ 0) collide in every band: always found
    assert(lsh.exists { case (a, b, _) => a == 5L && b == 102L })
    assert(lsh.exists { case (a, b, _) => a == 100L && b == 101L })
  }

  test("MinHashParams.forThreshold places the S-curve at the threshold within budget") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9); maxHashes <- Seq(64, 128)) {
      val p2 = Dedup.MinHashParams.forThreshold(t, maxHashes)
      assert(p2.numHashes <= maxHashes, s"t=$t budget blown: ${p2.numHashes}")
      // steep capture just above the threshold, low candidate mass below
      assert(p2.collisionProb(math.min(t + 0.15, 1.0)) >= 0.95, s"t=$t recall side")
      assert(p2.collisionProb(math.max(t - 0.25, 0.0)) <= 0.4, s"t=$t precision side")
      // the curve is monotone in j
      val probs = (0 to 20).map(i => p2.collisionProb(i / 20.0))
      assert(probs.zip(probs.tail).forall { case (a, b) => b >= a - 1e-12 })
    }
    // planner output drives the real pipeline: planted dups found at 0.8
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank at dawn"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank at dusk"),
      (3L, "completely different text about distributed columnar query engines today"),
    ).toDF("doc_id", "text")
    val planned = Dedup.MinHashParams.forThreshold(0.6, 128)
    val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        planned.copy(jaccardThreshold = 0.6)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedup with coarseBits=0 equals clusters over exact cosine pairs") {
    val df = vecCorpus()
    val exactPairs = Dedup.cosineNearDups(df, col("vec_id"), col("embedding"), 0.9)
      .select("id_a", "id_b")
    val expected = Dedup.assignClusters(df, col("vec_id"), exactPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.semanticDedup(df, col("vec_id"), col("embedding"), 0.9,
        coarseBits = 0, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(t => t._1 -> t._2).toMap == expected)
    // keep is exactly the id==component decision, one keeper per component
    got.foreach { case (id, comp, keep) => assert(keep == (id == comp)) }
    assert(got.count(_._3) == expected.values.toSet.size)
    // the planted dups collapsed: 3/100/101 one component, 5/102 another
    assert(Set(100L, 101L).forall(expected(_) == expected(3L)))
    assert(expected(102L) == expected(5L))
  }

  test("semanticDedup: identical vectors dedup at ANY coarseBits; drops are exact-precision") {
    val df = vecCorpus()
    val exactComp = Dedup.assignClusters(df, col("vec_id"),
        Dedup.cosineNearDups(df, col("vec_id"), col("embedding"), 0.9)
          .select("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Dedup.semanticDedup(df, col("vec_id"), col("embedding"), 0.9,
        coarseBits = 5, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val comp = got.map(t => t._1 -> t._2).toMap
    // identical vectors share a fingerprint, not just a bucket — immune to
    // bucket splits: 3/100/101 always land in one component
    assert(comp(100L) == comp(3L) && comp(101L) == comp(3L))
    // approximate recall, exact precision: every non-singleton component
    // semanticDedup forms is within a component the exact path forms
    got.filter(t => t._1 != t._2).foreach { case (id, c, _) =>
      assert(exactComp(id) == exactComp(c)) }
  }

  test("semanticDedup auto-plans coarse bits: pair cost stays ~linear on a 100x corpus") {
    // Planner math: minimum bits with expected bucket ≤ target.
    assert(Dedup.coarseBitsFor(0) == 0)
    assert(Dedup.coarseBitsFor(1024, 1024) == 0)
    assert(Dedup.coarseBitsFor(1025, 1024) == 1)
    assert(Dedup.coarseBitsFor(100 * 1024, 1024) == 7)   // 100 buckets → 2^7
    assert(Dedup.coarseBitsFor(1L << 40, 1024) == 30)
    assert(Dedup.coarseBitsFor(Long.MaxValue, 1) == 62)  // long-key cap

    // Planted corpora at n and 100n: bucket the vectors with the SAME
    // quantizer semanticDedup uses and check the within-bucket pair cost
    // Σ size·(size−1)/2 grows ~linearly (≤ c·n·target), NOT ~quadratically
    // — the round-5 fixed default left cost ∝ n²/2^bits.
    def pairCost(n: Int, target: Long): (Int, Double) = {
      val dim = 16
      val rnd = new scala.util.Random(7)
      val rows = (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
      val df = rows.toDF("vec_id", "embedding")
      val bits = Dedup.coarseBitsFor(n.toLong, target)
      val hp = graft.operators.Similarity.hyperplanes(bits, dim, 42L)
      def bucketOf(vCol: org.apache.spark.sql.Column) =
        if (bits == 0) lit(0L)
        else (0 until bits).map { i =>
          val plane = array(hp(i).map(lit): _*)
          when(graft.operators.Similarity.dot(vCol, plane) > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
      val cost = df.select(bucketOf(col("embedding").cast("array<double>")).as("b"))
        .groupBy("b").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("double")).as[Double].head()
      (bits, cost)
    }
    val target = 64L
    val (bitsSmall, costSmall) = pairCost(500, target)
    val (bitsBig, costBig) = pairCost(50000, target)
    assert(bitsBig > bitsSmall, s"planner must add bits with corpus growth: $bitsSmall -> $bitsBig")
    // expected cost ≤ n·target/2 per balanced bucketing; allow slack for
    // hyperplane imbalance on gaussian data (observed ~2x)
    assert(costBig <= 4.0 * 50000 * target,
      s"100x corpus pair cost must stay ~n·target, got $costBig")
    // the quadratic shape the planner prevents: cost grew far slower than n²
    assert(costBig / costSmall < 1000.0,
      s"cost ratio ${costBig / costSmall} should be ~linear (100x), not ~10000x")

    // End-to-end: the auto default produces the same exact-precision
    // guarantees on the planted corpus (identical vectors collapse).
    val df = vecCorpus()
    val auto = Dedup.semanticDedup(df, col("vec_id"), col("embedding"), 0.9, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(auto(100L) == auto(3L) && auto(101L) == auto(3L))
  }

  test("semanticDedup: null and zero vectors stay singleton keepers") {
    val rows: Seq[(Long, Array[Float])] = Seq(
      (1L, Array.fill(4)(1.0f)), (2L, Array.fill(4)(1.0f)),   // identical pair
      (3L, Array.fill(4)(0.0f)), (4L, Array.fill(4)(0.0f)),   // zero vectors
      (5L, null.asInstanceOf[Array[Float]]))                  // null vector
    val df = rows.toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, col("vec_id"), col("embedding"), 0.5,
        coarseBits = 2, dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    assert(got.filter(_._3).map(_._1).toSeq == Seq(1L, 3L, 4L, 5L))
  }
}
