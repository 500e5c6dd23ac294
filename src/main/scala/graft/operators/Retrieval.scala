package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval & association statistics: BM25 scoring and PMI-style
  * token co-occurrence — the query-side complement of the inverted-index
  * and TF-IDF operators in [[TextAnalysis]].
  *
  * Scale design: token explodes shuffle (token, partial-count) pairs via
  * map-side combine; corpus-wide constants (doc count, total length) are
  * one-row aggregates broadcast into the scoring stage; per-doc pair
  * generation is bounded by the top-N vocabulary filter, never the raw
  * vocabulary. Double math keeps a fixed left-to-right operation order so
  * the DuckDB oracle reproduces every score bit-for-bit.
  */
object Retrieval {

  /** BM25 top-k documents for each query term, with the rational idf
    * variant idf_r = (N - df + 0.5) / (df + 0.5) — monotone in the
    * classic log idf (so rankings agree) but free of the one operation
    * (`ln`) whose last bit is not pinned down by IEEE 754 across math
    * libraries. k1/b are the standard Robertson defaults.
    *
    * Plan: one token explode → (doc, term) tf counts filtered to the
    * query terms (the filter pushes below the explode's shuffle), df from
    * the tf rows themselves, corpus stats as a broadcast one-row cross
    * join, and a per-term top-k window over the (few) scored rows.
    */
  def bm25(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75, k: Int = 5): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = toks.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"))
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sdl").cast("double") / col("nd")
    val idf = ((col("nd") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val score = idf * ((col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"), col("tf"), col("df"), col("dl"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Token co-occurrence lift (exp-PMI): for pairs drawn from the top-N
    * corpus vocabulary, lift = N_docs·df(a,b) / (df(a)·df(b)) — > 1 means
    * the tokens attract, < 1 they repel. The integer products are exact
    * (counts fit a long at any realistic corpus size); the single double
    * division is per-row IEEE math.
    *
    * Plan: candidate pairs come from a doc_id-keyed self-equi-join of the
    * (doc, term) postings *after* the broadcast top-N vocabulary filter,
    * so per-doc pair fan-out is bounded by N², independent of document
    * length or vocabulary size.
    */
  def pmiPairs(docs: DataFrame, id: Column, text: Column,
               topN: Int = 50, limit: Int = 20): DataFrame = {
    val tok = docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("term"))
      .distinct()
    val top = docs.select(explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(topN).select("term")
    val ft = tok.join(broadcast(top), "term").select("doc_id", "term")
    val dfreq = ft.groupBy("term").agg(count(lit(1)).as("n"))
    val nd = docs.agg(count(lit(1)).as("ndocs"))
    val pairs = ft.as("a").join(ft.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .select(col("a.term").as("tok_a"), col("b.term").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(dfreq.select(col("term").as("tok_a"), col("n").as("n_a"))), "tok_a")
      .join(broadcast(dfreq.select(col("term").as("tok_b"), col("n").as("n_b"))), "tok_b")
      .crossJoin(broadcast(nd))
      .select(col("tok_a"), col("tok_b"), col("n_a"), col("n_b"), col("n_ab"),
        ((col("n_ab") * col("ndocs")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("tok_a"), col("tok_b")).limit(limit)
  }

  /** Exact phrase search over a POSITIONAL postings view: documents
    * containing `phrase` as consecutive whitespace tokens, with the
    * match count and the first match's token offset (0-based). The
    * retrieval capability a term-level inverted index cannot answer —
    * "spark sql" must not match "sql … spark".
    *
    * Plan: the postings view is filtered to each phrase term FIRST (the
    * per-term posting list — selective), then each adjacency step is one
    * (doc, pos)-keyed equi-join anchored at the first term's position.
    * Work ∝ Σ posting-list sizes of the phrase's terms, never the corpus;
    * k-term phrases cost k−1 bounded joins (static k — the joins
    * flatten into one codegen'd pipeline, not an iterative plan).
    */
  def phraseSearch(docs: DataFrame, id: Column, text: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    val pos = docs.where(text.isNotNull)
      .select(id.as("doc_id"), posexplode(split(text, " ")).as(Seq("pos", "term")))
    var cur = pos.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    for (i <- 1 until phrase.length) {
      cur = cur.as("a")
        .join(pos.where(col("term") === phrase(i)).as("b"),
          col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + i)
        .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos"))
    }
    cur.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
  }

  /** Reciprocal-rank fusion of two rankings (Cormack et al., SIGIR '09):
    * score(d) = 1/(c + rankA(d)) + 1/(c + rankB(d)), missing-side terms
    * contribute 0 — the standard way hybrid search merges a lexical
    * (BM25) and a prior/semantic ranking without comparing their
    * incommensurable scores. c = 60 is the paper's constant.
    *
    * Both inputs carry (doc_id, rank) with rank a 1-based total order.
    * The fused score is a FIXED two-operand sum (A-side term first, each
    * side an integral-denominator division) — never a groupBy float sum
    * of variable order — so it is bit-portable; ties break (score desc,
    * doc_id) for a total output order.
    *
    * Plan: one full-outer equi-join of two already-top-N tables + a
    * single-partition window over ≤ |A| + |B| rows — bounded by the
    * candidate lists, never the corpus.
    */
  def rrfFuse(rankA: DataFrame, rankB: DataFrame,
              c: Int = 60, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(c >= 0, s"c must be >= 0, got $c")
    val a = rankA.select(col("doc_id"), col("rank").cast("long").as("rank_a"))
    val b = rankB.select(col("doc_id"), col("rank").cast("long").as("rank_b"))
    val term = (r: Column) => coalesce(
      lit(1.0) / (lit(c.toLong) + r).cast("double"), lit(0.0))
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("rrf", term(col("rank_a")) + term(col("rank_b")))
      .withColumn("rank_fused", row_number().over(w))
      .where(col("rank_fused") <= topK)
      .select(col("doc_id"), col("rank_a"), col("rank_b"), col("rrf"),
        col("rank_fused"))
  }
}
