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
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1000000): Merges = {
    require(numMerges >= 0 && maxWords >= 1)
    val wf = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val (syms, n) = words(wi)
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          j += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic: max count, ties to the lexicographically least pair
        val best = counts.foldLeft(null: ((String, String), Long)) { (acc, e) =>
          if (acc == null) e
          else if (e._2 > acc._2 ||
            (e._2 == acc._2 && Ordering[(String, String)].lt(e._1, acc._1))) e
          else acc
        }._1
        merges += best
        words = words.map { case (syms, n) => (applyMerge(syms, best), n) }
        i += 1
      }
    }
    merges.toSeq
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
    var syms: Array[String] = word.map(_.toString).toArray
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
    * order. Null-safe (null array → null).
    */
  def encodeTokens(merges: Merges)(toks: Column): Column = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val enc = udf((ws: Seq[String]) =>
      if (ws == null) null else ws.flatMap(w => encodeWord(w, rank)))
    enc(toks)
  }

  /** Convenience: trained subword token count per text value. */
  def tokenCount(merges: Merges)(text: Column): Column =
    size(encodeTokens(merges)(TextAnalysis.tokens(text)))
}
