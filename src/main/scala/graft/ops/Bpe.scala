package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL byte-pair-encoding tokenizer — trainer + encoder (Sennrich et al.
  * 2016, the public BPE algorithm every LLM tokenizer descends from). This
  * replaces approximation with the actual algorithm for the token-budget
  * surfaces ([[TextAnalysis.bpeTokens]] remains the cheap codegen'd
  * pre-tokenizer; this is the trained form).
  *
  * Scale shape (the part that matters at 100 TB): the ONLY corpus-scale
  * work is one word-frequency aggregation (map-side partial count). The
  * merge loop then runs on the word-frequency TABLE, which is
  * vocabulary-sized, not corpus-sized — the standard trick (GPT-2's
  * trainer does the same): pair statistics over (word, freq) weigh each
  * distinct word once, multiplied by its count, and produce byte-identical
  * merges to a corpus-wide scan. The table is capped at `maxWords` by
  * frequency (TakeOrdered, never a full sort) so driver memory is bounded;
  * words below the cap contribute negligible pair mass by construction
  * (they are the frequency tail). Encoding is embarrassingly parallel —
  * one UDF per row with the merge-rank map in the closure (a UDF by
  * necessity: no built-in expression applies ordered merge rules).
  *
  * Determinism: merge ties break on (count desc, pair lexicographic) —
  * identical merges on identical data, any partitioning. Training is
  * word-internal (no cross-word merges), so no end-of-word marker is
  * needed for token-count fidelity.
  */
object Bpe {

  /** Learned merge rules in application order. */
  type Merges = Seq[(String, String)]

  /** Train `numMerges` BPE merges from the corpus's word-frequency table.
    * One distributed aggregation; the greedy loop is driver-side over at
    * most `maxWords` (vocabulary-sized) entries.
    *
    * Pair statistics are maintained INCREMENTALLY (the reference
    * `learn_bpe` layout): each merge touches only the words that contain
    * the merged pair — via a pair→word-indices occurrence index — instead
    * of rescanning every symbol of every word per iteration, which at the
    * 1M-word cap would be ~8M hash updates × numMerges. The max-pair
    * selection is a fold over the pair-count map with a total order
    * (count desc, pair lex asc), so it is iteration-order independent and
    * the learned merges are identical to the naive rescan's.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1000000, minFreq: Long = 1L): Merges = {
    require(numMerges >= 0 && maxWords >= 1 && minFreq >= 1)
    // driver memory is DOUBLY bounded: minFreq prunes the frequency tail
    // inside the aggregation (at web scale most distinct words are
    // hapax noise — typos, ids, binary junk — that can never win a merge),
    // and the orderBy+limit plans as TakeOrderedAndProject (a bounded
    // per-partition top-N heap, never a full sort or an unbounded collect)
    val wf = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minFreq)
      .orderBy(col("n").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val words: Array[Array[String]] = wf.map(w => splitSymbols(w._1))
    val freqs: Array[Long] = wf.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    // delta = ±1: add/remove word wi's adjacent-pair contributions. The
    // occurrence index only grows here; stale entries (a word that no
    // longer contains the pair after other merges) are skipped at merge
    // time by the containment re-check.
    def contribute(wi: Int, delta: Long): Unit = {
      val syms = words(wi); val n = freqs(wi)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val c = counts.getOrElse(p, 0L) + delta * n
        if (c <= 0L) counts.remove(p) else counts.update(p, c)
        if (delta > 0) occurs.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
        j += 1
      }
    }
    def containsPair(syms: Array[String], m: (String, String)): Boolean = {
      var j = 0
      while (j < syms.length - 1) {
        if (syms(j) == m._1 && syms(j + 1) == m._2) return true
        j += 1
      }
      false
    }
    words.indices.foreach(contribute(_, 1L))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val learned = scala.collection.mutable.Set.empty[(String, String)]
    var i = 0
    while (i < numMerges && counts.nonEmpty) {
      // deterministic: max count, ties to the lexicographically least pair
      val best = counts.foldLeft(null: ((String, String), Long)) { (acc, e) =>
        if (acc == null) e
        else if (e._2 > acc._2 ||
          (e._2 == acc._2 && Ordering[(String, String)].lt(e._1, acc._1))) e
        else acc
      }._1
      def applyBest(): Unit =
        occurs.remove(best).getOrElse(scala.collection.mutable.Set.empty[Int])
          .foreach { wi =>
            if (containsPair(words(wi), best)) {
              contribute(wi, -1L)
              words(wi) = applyMerge(words(wi), best)
              contribute(wi, 1L)
            }
          }
      if (learned(best)) {
        // an ALREADY-LEARNED pair can re-enter the counts when later
        // merges recreate its two symbols adjacently via a different
        // decomposition. encodeWord would merge it again at its ORIGINAL
        // rank, so training re-applies the existing rule — appending a
        // duplicate would waste a numMerges slot and collapse the encode
        // rank map (zipWithIndex.toMap keeps the LATER rank), diverging
        // encode from the trained segmentation. No slot is consumed.
        applyBest()
      } else {
        learned += best
        merges += best
        applyBest()
        i += 1
      }
    }
    merges.toSeq
  }

  /** Initial symbol split by Unicode CODE POINT, not UTF-16 unit: unit
    * splitting breaks a non-BMP character (emoji, rare CJK) into two lone
    * surrogate halves, which UTF-8 re-encoding on the Spark side turns
    * into replacement bytes — distinct characters would collapse into
    * identical '?' tokens and token text could not round-trip.
    */
  private def splitSymbols(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Merge every adjacent occurrence of the pair, left to right — the same
    * application order in training and encoding, so encoding a training
    * word reproduces its trained segmentation exactly.
    */
  private[ops] def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += (m._1 + m._2); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Encode one word: repeatedly apply the LOWEST-RANKED applicable merge
    * (the standard BPE encode order — rank order, not left-to-right scan
    * order, which is what makes encode(training word) == trained
    * segmentation).
    */
  private[ops] def encodeWord(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = splitSymbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var k = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; k = j }
        j += 1
      }
      if (k < 0) continue = false
      else {
        syms = applyMerge(syms, (syms(k), syms(k + 1)))
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Column encoder over a token-array column: each word splits into its
    * BPE subword tokens; the flattened subword sequence preserves word
    * order. Null-safe at BOTH levels (null array → null; null ELEMENTS
    * inside the array are skipped — they carry no subwords, and the
    * general array<string> column contract this public signature offers
    * admits them even though TextAnalysis.tokens never emits one).
    */
  def encodeTokens(merges: Merges)(toks: Column): Column = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val enc = udf((ws: Seq[String]) =>
      if (ws == null) null
      else ws.iterator.filter(_ != null).flatMap(w => encodeWord(w, rank)).toSeq)
    enc(toks)
  }

  /** Convenience: trained subword token count per text value. NULL text →
    * NULL count (unguarded, `size(null)` is the legacy −1 under the
    * repo's ANSI-off config — the [[TextAnalysis.tokenCount]] hazard).
    */
  def tokenCount(merges: Merges)(text: Column): Column =
    when(text.isNotNull, size(encodeTokens(merges)(TextAnalysis.tokens(text))))
}
