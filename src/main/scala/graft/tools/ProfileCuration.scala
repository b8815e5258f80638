package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Scratch profiler for the curation-pipeline hot path (not part of the
  * library surface; run manually while optimizing).
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // match the BENCH posture exactly (AQE off): this profiler exists to
      // optimize the benched hot path, and AQE-on re-plans exchanges into
      // a different job/stage shape than the one being tuned
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the kernels assume ANSI-off legacy semantics (Prep's contract:
    // every entry point applies these defensively) — without it, Spark 4
    // defaults ANSI on and the profiled plans can throw or diverge
    graft.Prep.ensure(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.format("noop").mode("overwrite").save() // warm

    val toksDF = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rep = TextAnalysis.repetitionSignalsFromTokens(toksDF, "doc_id", "_toks", n = 2)
      .where(col("dup_frac") < 0.4).select("doc_id")
    time("repetition")(rep.write.format("noop").mode("overwrite").save())
    val corpusSh = Dedup.shingleTableFromTokens(toksDF, "doc_id", "_toks", 3)
    val benchSh = Dedup.shingleTableFromTokens(
      toksDF.where(col("doc_id") % 37 === 0), "doc_id", "_toks", 3)
    val cont = Dedup.contaminationScoresFromShingles(corpusSh, benchSh, "doc_id")
      .where(col("contamination") < 0.5).select("doc_id")
    time("contamination")(cont.write.format("noop").mode("overwrite").save())
    val surviving = toksDF.join(rep, "doc_id").join(cont, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("surviving materialize")(surviving.write.format("noop").mode("overwrite").save())
    val survSh = Dedup.shingleTableFromTokens(surviving, "doc_id", "_toks", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.minhashNearDupPairsFromShingles(survSh, "doc_id",
      numHashes = 8, rowsPerBand = 2, threshold = 0.1)
    time("minhash pairs")(pairs.write.format("noop").mode("overwrite").save())
    val clusters = time("dedupClusters")(
      Dedup.dedupClusters(pairs, "doc_a", "doc_b"))
    val deduped = Dedup.applyClusterDedup(surviving, "doc_id", clusters)
    time("deduped count")(println("  n_dedup=" + deduped.count()))
    val chunks = TextAnalysis.chunkFromTokens(deduped, "doc_id", "_toks",
      chunkTokens = 32, stride = 24)
    time("chunks count")(println("  n_chunks=" + chunks.count()))
    spark.stop()
  }
}
