package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization as a distributed operator: the REAL
  * merge algorithm (iteratively fuse the lowest-rank adjacent pair, all
  * occurrences left-to-right, until no ranked pair remains — the
  * Sennrich et al. 2016 / GPT-2 procedure), driven by a caller-supplied
  * ordered merge table, so `q_pack`/`q_chunk`-style token budgets can run
  * on true merged-token counts instead of the pre-tokenizer approximation
  * ([[TextAnalysis.bpeTokenCount]], which stops at the regex pieces).
  *
  * Pre-tokenization uses [[TextAnalysis.BpeTokenPattern]] (the
  * engine-portable GPT-2-style pattern); merges never cross pre-token
  * boundaries, and each pre-token splits into Unicode CODE POINTS (not
  * UTF-16 units — a surrogate pair is one initial token, matching every
  * byte/char-level tokenizer and RE2's `.`).
  *
  * Scale shape: the merge table rides to executors once per task closure
  * (vocabulary-scale tables are kilobytes; a broadcast would also do),
  * and the encode is a per-partition JVM kernel over batched rows — the
  * [[TextAnalysis.hashedLinearScore]] family — so a 100 TB corpus
  * tokenizes map-only with zero shuffle.
  *
  * Oracle story (SEQUENTIAL-REPLAY EQUIVALENCE): for a VALID merge table
  * — each rule's sides are single code points or outputs of
  * EARLIER rules ([[validateMerges]]) — true min-rank BPE equals applying
  * the rules one by one in rank order, each exhaustively left-to-right.
  * Proof sketch: merging a lower-rank pair can only create a new
  * occurrence of pair (a,b) if its output equals `a` or `b`; validity
  * puts the rule producing that output EARLIER than any rule consuming
  * it, so once rule k is exhausted it can never reappear. Exhaustive
  * left-to-right for ONE rule is a single non-overlapping scan (an
  * output is strictly longer than either input, so replacements never
  * seed the same pair). An external engine can therefore replay the
  * encode as a chain of plain string `replace` calls over a delimited
  * form — exactly what SparkEntry's `q_bpe_encode` oracle SQL does.
  */
object Bpe {

  /** A small demonstration merge table over common English letter pairs,
    * VALID in the [[validateMerges]] sense and restricted to ASCII
    * letters (so merges can never involve the pre-token's leading-space
    * character and the oracle's delimited replay stays unambiguous).
    */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"), ("r", "e"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("o", "u"), ("s", "t"),
    ("e", "n"), ("a", "t"), ("o", "r"), ("e", "s"), ("h", "e"))

  /** Require the sequential-replay validity invariant: every rule side is
    * a single code point or the output of an earlier rule. (True BPE
    * training always produces such tables — a pair over `xy` can only be
    * counted after `xy` exists.)
    */
  def validateMerges(merges: Seq[(String, String)]): Unit = {
    val produced = scala.collection.mutable.Set.empty[String]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def ok(s: String) = s.codePointCount(0, s.length) == 1 || produced.contains(s)
      require(ok(a) && ok(b),
        s"merge #$i ($a,$b): sides must be single code points or earlier-rule outputs")
      produced += (a + b)
    }
  }

  /** Split into code points (a surrogate pair is ONE initial token). */
  def codePoints(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += s.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Encode ONE pre-token: repeatedly find the lowest-rank adjacent pair
    * and merge ALL its occurrences left-to-right. O(len · merges applied);
    * pre-tokens are words, so len is small and the simple rescan beats
    * heap bookkeeping.
    */
  def encodeWord(word: Array[String], ranks: Map[(String, String), Int]): Array[String] = {
    if (word.length < 2) return word
    var toks = word
    while (toks.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) return toks
      val a = toks(bi)
      val b = toks(bi + 1)
      val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
      var j = 0
      while (j < toks.length) {
        if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
          out += a + b; j += 2
        } else { out += toks(j); j += 1 }
      }
      toks = out.toArray
    }
    toks
  }

  /** The engine-portable pre-tokenizer, compiled once per partition. */
  private def pretokenizer = java.util.regex.Pattern.compile(TextAnalysis.BpeTokenPattern)

  /** Encode a full document: strip the oracle's delimiter code points
    * (U+0001/U+0002 — semantically invisible in text corpora; stripping
    * keeps the external replay exact), pre-tokenize, merge per pre-token.
    * Characters the pre-tokenizer skips (a lone apostrophe) are dropped,
    * matching `regexp_extract_all` semantics on both engines.
    */
  def encode(text: String, ranks: Map[(String, String), Int],
      pat: java.util.regex.Pattern): Array[String] = {
    val clean = text.replace("\u0001", "").replace("\u0002", "")
    val m = pat.matcher(clean)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out ++= encodeWord(codePoints(m.group()), ranks)
    out.toArray
  }

  /** Convenience single-string form (specs, ad-hoc use). */
  def encode(text: String, merges: Seq[(String, String)]): Array[String] =
    encode(text, merges.zipWithIndex.toMap, pretokenizer)

  /** (doc_id, n_bpe_tokens) per non-null-text document — the exact token
    * counter for budget-driven packing/chunking. Map-only.
    */
  def tokenCounts(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    df.where(text.isNotNull)
      .select(id.cast("long").as("doc_id"), text.as("t")).as[(Long, String)]
      .mapPartitions { rows =>
        val pat = pretokenizer // compiled once per partition
        rows.map { case (i, t) => (i, encode(t, ranks, pat).length.toLong) }
      }.toDF("doc_id", "n_bpe_tokens")
  }

  /** (doc_id, toks ARRAY<STRING>) per non-null-text document — feeds
    * [[TextAnalysis.chunkBpeTokens]] (token-array slicing) and any
    * downstream consumer of real token streams. Map-only.
    */
  def encodeTokens(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    df.where(text.isNotNull)
      .select(id.cast("long").as("doc_id"), text.as("t")).as[(Long, String)]
      .mapPartitions { rows =>
        val pat = pretokenizer
        rows.map { case (i, t) => (i, encode(t, ranks, pat)) }
      }.toDF("doc_id", "toks")
  }

  /** Merge every left-to-right occurrence of the single pair (a, b) —
    * one training round's application (also the inner step of
    * [[encodeWord]], which repeats it per min-rank pair).
    */
  private def mergeAll(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
        out += a + b; j += 2
      } else { out += toks(j); j += 1 }
    }
    out.toArray
  }

  /** Distributed BPE TRAINING (Sennrich et al. 2016): learn `nMerges`
    * merge rules from the corpus itself. The corpus is touched ONCE — a
    * single aggregation builds the pre-token frequency table (bounded by
    * VOCABULARY, not corpus size; this is why BPE training scales: a
    * 100 TB corpus has millions of distinct pre-tokens, not trillions) —
    * then each round runs on the word table: adjacent-pair counts
    * weighted by word frequency (flatMap + one map-side-combined
    * aggregate), the arg-max pair via TakeOrdered
    * (count DESC, then (a, b) ascending in UTF8-binary order — Spark's
    * native string order, identical to DuckDB's binary collation, so the
    * oracle replays every tie), and a map-only application of the chosen
    * merge. Per-round `localCheckpoint` truncates the iterative lineage
    * (the kCore/components discipline — word tables are bounded).
    *
    * The trained table is VALID by construction (round k's pair sides are
    * single code points or outputs of rounds < k), so it feeds
    * [[encode]]/[[tokenCounts]] AND the sequential-replay oracle form
    * directly. Throws if the corpus runs out of adjacent pairs before
    * `nMerges` (train less or feed more text — silence would corrupt
    * downstream rank arithmetic).
    */
  def trainMerges(df: DataFrame, text: Column, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0 && nMerges <= 256, s"nMerges must be in [1,256], got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.where(text.isNotNull).select(text.as("t")).as[String]
      .mapPartitions { it =>
        val p = pretokenizer
        it.flatMap { t =>
          val m = p.matcher(t.replace("\u0001", "").replace("\u0002", ""))
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) buf += m.group()
          buf.iterator
        }
      }
      .groupByKey(identity).count()
      .map { case (w, c) => (codePoints(w).toSeq, c) }
      .toDF("toks", "cnt")
    var reps = words.localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < nMerges) {
      val top = reps.as[(Seq[String], Long)]
        .flatMap { case (toks, c) =>
          (0 until toks.length - 1).iterator.map(i => (toks(i), toks(i + 1), c))
        }
        .toDF("a", "b", "c")
        .groupBy("a", "b").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty)
        throw new IllegalStateException(
          s"BPE training exhausted adjacent pairs after ${out.size} of $nMerges merges")
      val a = top(0).getString(0)
      val b = top(0).getString(1)
      out += ((a, b))
      val prev = reps
      reps = prev.as[(Seq[String], Long)]
        .map { case (toks, c) => (mergeAll(toks.toArray, a, b).toSeq, c) }
        .toDF("toks", "cnt")
        .localCheckpoint(true)
      k += 1
    }
    out.toSeq
  }

  /** [[trainMerges]] as a harness-checkable table: one row per learned
    * rule — (merge_rank, lhs, rhs) in training order.
    */
  def trainMergesTable(df: DataFrame, text: Column, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, text, nMerges).zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("merge_rank", "lhs", "rhs")
  }

  /** [[Packing.packTokenStream]] on TRUE BPE token counts: pack the
    * corpus token stream into `budget`-token examples where the budget is
    * measured in merged tokens, not whitespace or pre-tokenizer pieces.
    */
  def packTokenStream(df: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)], budget: Int, numPartitions: Int = 0): DataFrame =
    Packing.packCounted(
      tokenCounts(df, id, text, merges).toDF("id", "n_tokens"),
      budget, numPartitions)
}
