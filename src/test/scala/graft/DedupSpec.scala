package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different words about spark query engines and parquet columnar formats"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 0
  ).toDF("doc_id", "text")

  test("minhash LSH finds the constructed near-dup pairs with exact jaccard") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dups
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("jaccard of the exact-dup pair is 1.0") {
    val jac = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .where($"doc_a" === 0 && $"doc_b" === 3).select("jac").as[Double].head()
    assert(jac == 1.0)
  }

  test("simhash banded candidates == brute-force hamming scan (pigeonhole exactness)") {
    val d = Tables.load(spark, sf0001, "documents").limit(200)
    val banded = Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val h = Dedup.simhash60(d, "doc_id", "text")
    val a = h.select($"doc_id".as("doc_a"), $"simhash".as("ha"))
    val b = h.select($"doc_id".as("doc_b"), $"simhash".as("hb"))
    val brute = a.crossJoin(b).where($"doc_a" < $"doc_b")
      .where(call_function("bit_count", $"ha".bitwiseXOR($"hb")) <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded == brute)
  }

  test("identical texts get identical simhash; disjoint-vocab texts differ") {
    val h = Dedup.simhash60(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(h(0L) == h(3L))
    assert(h(0L) != h(2L))
  }
}
