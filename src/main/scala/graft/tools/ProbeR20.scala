package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Lineage._

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

    // ---- op_bfs stage decomposition ----
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    def edgeBuild(): DataFrame = {
      val e0 = li.select(col("l_orderkey"), col("l_suppkey"))
        .join(ord.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    time("bfs_edge_build_noop")(noop(edgeBuild()))
    time("bfs_edge_checkpoint") {
      val e = edgeBuild().graftCheckpoint()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
    }
    // ---- q7 join-strategy A/B: sort-merge vs shuffled-hash ----
    locally {
      val li2 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ord2 = spark.read.parquet(s"$sfDir/orders.parquet")
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      val sup2 = spark.read.parquet(s"$sfDir/supplier.parquet")
      val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      def q7(h: String): DataFrame = {
        val n1 = nat.select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
        val n2 = nat.select(col("n_nationkey").as("_cnk"), col("n_name").as("cust_nation"))
        li2.join(ord2.hint(h), col("l_orderkey") === col("o_orderkey"))
          .join(sup2.hint(h), col("l_suppkey") === col("s_suppkey"))
          .join(cust.hint(h), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("_snk"))
          .join(broadcast(n2), col("c_nationkey") === col("_cnk"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate").cast("date")).cast("long").as("l_year"))
          .agg(count(lit(1)).as("n_items"))
      }
      time("q7_merge")(noop(q7("merge")))
      time("q7_shuffle_hash")(noop(q7("shuffle_hash")))
      // pre-filtered dims: push the nation pair into supplier/customer
      // BEFORE the fact joins (2 of 25 nations survive)
      def q7filtered(h: String): DataFrame = {
        val n1 = nat.select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
          .where(col("supp_nation").isin("NATION_1", "NATION_2"))
        val n2 = nat.select(col("n_nationkey").as("_cnk"), col("n_name").as("cust_nation"))
          .where(col("cust_nation").isin("NATION_1", "NATION_2"))
        val sf = sup2.join(broadcast(n1), col("s_nationkey") === col("_snk"))
        val cf = cust.join(broadcast(n2), col("c_nationkey") === col("_cnk"))
        li2.join(sf.hint(h), col("l_suppkey") === col("s_suppkey"))
          .join(ord2.hint(h), col("l_orderkey") === col("o_orderkey"))
          .join(cf.hint(h), col("o_custkey") === col("c_custkey"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate").cast("date")).cast("long").as("l_year"))
          .agg(count(lit(1)).as("n_items"))
      }
      time("q7_filtered_merge")(noop(q7filtered("merge")))
      time("q7_filtered_shj")(noop(q7filtered("shuffle_hash")))
    }

    // ---- ngram jaccard decomposition ----
    locally {
      import graft.ops.Dedup
      time("ngram_full")(noop(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.5, maxDf = 10)))
      spark.catalog.clearCache()
      val sh2 = Dedup.shingleTable(docs, "doc_id", "text", 3)
      time("ngram_shingle_explode")(noop(sh2))
      time("ngram_postings_capped")(noop(sh2.groupBy(col("shingle"))
        .agg(graft.functions.CappedIds(10)(col("doc_id")).as("_g"))
        .select(col("_g.n").as("_df"), col("_g.ids").as("_ids"))))
      time("ngram_collect_sets")(noop(sh2.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("shingle"))).as("_set"))))
      val prevT = spark.conf.get("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      time("ngram_postings_nofallback")(noop(sh2.groupBy(col("shingle"))
        .agg(graft.functions.CappedIds(10)(col("doc_id")).as("_g"))
        .select(col("_g.n").as("_df"), col("_g.ids").as("_ids"))))
      time("ngram_full_nofallback")(noop(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.5, maxDf = 10)))
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", prevT)
      spark.catalog.clearCache()
    }

    // ---- simhash60 signature A/B ----
    locally {
      val tok = docs.select(col("doc_id"), explode(toks).as("tok"))
      def sig(h: org.apache.spark.sql.Column): DataFrame = {
        val withH = tok.withColumn("h", h)
        val contribs = (0 until 60).map { i =>
          sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$i")
        }
        withH.groupBy(col("doc_id")).agg(contribs.head, contribs.tail: _*)
      }
      val hOld = conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
      val hNew = graft.functions.Md5SlicesOps.md5Bits60(col("tok"))
      time("simhash_sig_conv")(noop(sig(hOld)))
      time("simhash_sig_kernel")(noop(sig(hNew)))
      val dd = tok.withColumn("a", hOld).withColumn("b", hNew)
        .where(col("a") =!= col("b")).count()
      println(s"PROBE simhash_bits60_diff_rows: $dd")
      time("simhash_full")(noop(graft.ops.Dedup.simhashNearDupPairs(
        docs, "doc_id", "text", maxHamming = 3)))
    }

    time("bfs_full") {
      val e = edgeBuild().graftCheckpoint()
      val seeds = sup.where(col("s_suppkey") % 100 === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      val dist = graft.ops.Analytics.bfsHops(e, seeds, maxHops = 6)
      val nodes = e.select(col("src").as("node")).distinct()
      val reached = dist.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      val unreached = nodes
        .join(dist.select(col("node")).hint("merge"), Seq("node"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1).as("dist"), col("n_nodes"))
      reached.unionByName(unreached).collect()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(dist)
    }
    spark.stop()
  }
}
