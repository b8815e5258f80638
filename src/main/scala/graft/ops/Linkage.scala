package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find, for each record of a dirty
  * table, its best fuzzy match in a clean reference table. (No reference
  * analog; north-star extension family, SURVEY.md §2.7 — the dedup
  * counterpart for STRUCTURED records, where near-duplicate documents
  * become near-duplicate entities.)
  *
  * The scale shape is the same bargain as every LSH family in this repo:
  * an all-pairs edit-distance scan is O(N·M) and dead at corpus scale, so
  * candidates come from an EQUI-join on a blocking key and only block-mates
  * pay the edit-distance verify. Blocking granularity is the knob: with
  * ~B records per block the candidate volume is linear in the input with
  * constant B — choose the key so true matches agree on it (here: a
  * corruption-stable substring) and B stays bounded. Missed matches are
  * exactly the pairs whose blocking keys disagree — the standard
  * recall/cost trade, made explicit and testable.
  */
object Linkage {

  /** Candidate pairs: equi-join on the block key, then Levenshtein ≤
    * `maxDist` verify. Inputs carry (id, name, block). Never a cartesian:
    * the only join is on `block`, and the verify runs on block-mates only.
    */
  def candidates(clean: DataFrame, dirty: DataFrame, maxDist: Int): DataFrame = {
    val c = clean.select(col("id").as("clean_id"), col("name").as("clean_name"),
      col("block"))
    val d = dirty.select(col("id").as("dirty_id"), col("name").as("dirty_name"),
      col("block"))
    // threshold form: the DP short-circuits to -1 once the distance
    // provably exceeds maxDist — O(maxDist·len) per pair instead of the
    // full O(n·m) matrix for the vast majority of block-mates that are
    // nowhere near a match. For surviving pairs (>= 0) the value IS the
    // exact distance, so downstream semantics are unchanged.
    d.join(c, Seq("block"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("clean_name"), maxDist))
      .where(col("dist") >= 0)
  }

  /** Best match per dirty record: minimum edit distance, ties broken by
    * the smallest clean id (deterministic — a linkage that returns "some
    * match" is not replayable). One window shuffle on dirty_id over the
    * already-thinned candidate set. Dirty records with no candidate in
    * their block (or none within `maxDist`) are absent from the result —
    * the caller decides whether absence means "new entity" or "review".
    */
  def bestMatch(clean: DataFrame, dirty: DataFrame, maxDist: Int): DataFrame = {
    val w = Window.partitionBy(col("dirty_id"))
      .orderBy(col("dist"), col("clean_id"))
    candidates(clean, dirty, maxDist)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("dirty_id"), col("clean_id"), col("dirty_name"),
        col("clean_name"), col("dist"))
  }
}
