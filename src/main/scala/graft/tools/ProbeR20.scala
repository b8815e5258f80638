package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for round-20 optimization probes (not part of the
  * library surface; run manually while optimizing). Times isolated
  * components of the text/dedup hot path under the exact bench posture
  * (local[32], SP=8, AQE off), noop sink, 1 warm + 3 timed reps.
  */
object ProbeR20 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Prep.ensure(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm: codegen + JIT
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label: " + ts.map(t => f"$t%.3f").mkString(" "))
    }
    println("PROBE n_docs: " + docs.count())
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    time("scan_only")(noop(docs.select(col("doc_id"), length(col("text")).as("l"))))
    time("split_regex_only")(noop(docs.select(col("doc_id"), size(split(col("text"), "\\s+")).as("n"))))
    time("tokens_hof_filter")(noop(docs.select(col("doc_id"), size(toks).as("n"))))
    time("tokens_explode")(noop(docs.select(col("doc_id"), explode(toks).as("t"))))
    time("shingle3_kernel_explode")(noop(docs.select(col("doc_id"),
      explode(graft.functions.NGramsOps.ngrams(toks, 3)).as("s"))))
    time("shingle3_distinct_md5")(noop(docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.NGramsOps.ngrams(toks, 3))).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h"))))
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.NGramsOps.ngrams(toks, 3))).as("shingle"))
    time("minhash_8agg")(noop(sh.withColumn("_md5", md5(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(min(substring(col("_md5"), 1, 4)).as("mh0"),
        (1 until 8).map(s => min(substring(col("_md5"), s * 4 + 1, 4)).as(s"mh$s")): _*)))
    time("minhash_8agg_int_kernel")(noop(sh
      .withColumn("_mh", graft.functions.Md5SlicesOps.md5Slices16(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(min(col("_mh").getItem(0)).as("mh0"),
        (1 until 8).map(s => min(col("_mh").getItem(s)).as(s"mh$s")): _*)))
    // equivalence spot check: int-min → hex4 equals string-min
    val a = sh.withColumn("_md5", md5(col("shingle"))).groupBy(col("doc_id"))
      .agg(min(substring(col("_md5"), 1, 4)).as("mh0"),
        (1 until 8).map(s => min(substring(col("_md5"), s * 4 + 1, 4)).as(s"mh$s")): _*)
    val b = sh.withColumn("_mh", graft.functions.Md5SlicesOps.md5Slices16(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(min(col("_mh").getItem(0)).as("mh0i"),
        (1 until 8).map(s => min(col("_mh").getItem(s)).as(s"mh${s}i")): _*)
    val bHex = b.select(col("doc_id") +: (0 until 8).map(s =>
      graft.functions.Md5SlicesOps.md5Hex4(col(s"mh${s}i")).as(s"mh$s")): _*)
    val diff = a.exceptAll(bHex).count() + bHex.exceptAll(a).count()
    println(s"PROBE minhash_equivalence_diff_rows: $diff")
    spark.stop()
  }
}
