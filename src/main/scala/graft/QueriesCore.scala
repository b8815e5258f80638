package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.functions.Geo
import graft.Queries._

/** Registry chunk of [[Queries.all]] — headline TPC-H-shaped aggregations, §2.1–2.4 driver operators (sources / transforms / joins / aggregates-dedup-set-ops) and the §3.3 production analytics.
  * Split from the Queries.scala monolith (round 13) purely for review and
  * merge cost; shared helpers stay in [[Queries]] and every entry is
  * byte-identical to its pre-split form. 54 keys.
  */
private[graft] object QueriesCore {
  val defs: Seq[QueryDef] = Seq(
    // ---- headline relational aggregations (TPC-H-shaped) ----
    QueryDef("q1_pricing",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .orderBySmall(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        ${dsumSql("l_extendedprice", 20, 2)} AS sum_base,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc,
        sum(l_quantity) / count(*) AS avg_qty,
        count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q3_priority",
      (s, d) => {
        val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders").where(col("o_orderdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        val l = t(s, d, "lineitem").where(col("l_shipdate") > expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
        // fact×fact and fact×customer are SF-growing both sides: sort-merge
        // is the only join shape that survives 100 TB, and each avoided
        // broadcast build is one fewer scheduling round on the driver
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    QueryDef("q5_volume",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders").where(
          col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        // growing tables (lineitem/orders/customer/supplier) sort-merge —
        // supplier is SF-proportional, so its former broadcast dies at
        // scale; nation (25 rows) and region (5) are FIXED-size and stay
        // broadcast at any SF
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(su.hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBySmall(col("r_name"), col("n_name"))
      },
      Some(s"""SELECT r_name, n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_unpivot",
      // wide→long melt of per-customer numeric measures via stack() — the
      // inverse surface of op_pivot; pure projection, zero shuffles
      (s, d) => Transforms.unpivot(
          t(s, d, "customer").select(col("c_custkey"),
            col("c_acctbal").as("acctbal"),
            col("c_nationkey").cast("double").as("nation_d")),
          ids = Seq("c_custkey"), measures = Seq("acctbal", "nation_d"))
        .orderBy(col("c_custkey"), col("measure")),
      Some("""SELECT c_custkey, measure, value FROM (
          SELECT c_custkey, acctbal, nation_d FROM (
            SELECT c_custkey, c_acctbal AS acctbal, CAST(c_nationkey AS DOUBLE) AS nation_d
            FROM customer))
        UNPIVOT (value FOR measure IN (acctbal, nation_d))
        ORDER BY c_custkey, measure""")),

    QueryDef("op_upsert",
      // MERGE semantics (update-or-insert, last write wins): orders with
      // key%10=0 get a re-priced update batch plus synthetic new keys; the
      // result must contain exactly the updated, inserted, and untouched
      // rows. anti-join + union — one shuffle each side.
      (s, d) => {
        val base = mergeFixtureBase(s, d)
        val updates = mergeFixtureUpdates(base)
        Aggregates.upsert(base, updates, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""WITH $mergeFixtureSql
        SELECT b.o_orderkey, b.o_totalprice FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM upd
        ORDER BY o_orderkey""")),

    QueryDef("op_merge_acid",
      // the ACID form of op_upsert: the SAME last-write-wins MERGE, but
      // executed through the versioned-manifest commit protocol
      // (ops.ManifestTable) — base committed as v0, updates merged
      // copy-on-write as v1, result read back from the committed snapshot.
      // The oracle is the relational MERGE: the commit protocol must be
      // invisible in the data. Table root is per-sfdir+pid in tmp so
      // verify/bench runs never collide; wiped at entry so re-runs start
      // from a fresh log.
      (s, d) => {
        // dead siblings are reclaimed by the shared memoized sweep inside
        // freshScratchRoot (Queries.sweepStaleSiblings) — not re-listed here
        val root = freshScratchRoot(s, "acid", d)
        val base = mergeFixtureBase(s, d)
        val updates = mergeFixtureUpdates(base)
        val mt = ManifestTable(s, root)
        mt.overwrite(base)
        mt.merge(updates, Seq("o_orderkey"))
        mt.snapshot().orderBy(col("o_orderkey"))
      },
      Some(s"""WITH $mergeFixtureSql
        SELECT b.o_orderkey, b.o_totalprice FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM upd
        ORDER BY o_orderkey""")),

    QueryDef("op_merge_acid_os",
      // op_merge_acid executed through the CONDITIONAL-PUT commit log
      // (round-13 storage seam): same base/updates construct, same
      // relational-MERGE oracle — the commit protocol, whichever log store
      // carries it, must be invisible in the data. Data files land on the
      // local scratch filesystem exactly as on a cloud deployment via the
      // store's Hadoop connector; only the log's atomicity rides the
      // conditional PUT. Since round 17 the client is the REAL
      // filesystem-backed adapter ([[graft.ops.HadoopFsObjectStore]] —
      // link-published conditional PUTs on actual disk), so this key
      // certifies the deployable path; SPARK_GRAFT_OS_CLIENT=memory
      // reverts to the in-memory S3-semantics client (which op_exactly_once
      // still exercises, keeping both clients under the oracle gate).
      // freshScratchRoot wipes the root per invocation, so either log
      // starts at v0 with no extra sweep.
      (s, d) => {
        val root = freshScratchRoot(s, "acidos", d)
        val base = mergeFixtureBase(s, d)
        val updates = mergeFixtureUpdates(base)
        val client =
          if (sys.env.get("SPARK_GRAFT_OS_CLIENT").contains("memory")) new InMemoryObjectStore
          else new graft.ops.HadoopFsObjectStore(root, s.sparkContext.hadoopConfiguration)
        val mt = ManifestTable.onObjectStore(s, root, client)
        mt.overwrite(base)
        mt.merge(updates, Seq("o_orderkey"))
        mt.snapshot().orderBy(col("o_orderkey"))
      },
      Some(s"""WITH $mergeFixtureSql
        SELECT b.o_orderkey, b.o_totalprice FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM upd
        ORDER BY o_orderkey""")),

    QueryDef("op_exactly_once",
      // The round-14 batch-token protocol under the driver oracle: a table
      // is built through appendOnce/mergeOnce INCLUDING the two replay
      // hazards the tokens exist to close — the appended batch is replayed
      // (double-append would double its rows), and the token merge is
      // replayed AFTER an interleaved plain merge touched its keys
      // (last-write-wins would revert the interleaved value). The final
      // snapshot hashes against the analytic end state, so either failure
      // mode breaks the hash — exactly-once certified by the same gate as
      // every data operator, not just by specs. Same fresh-per-invocation
      // object-store log as op_merge_acid_os.
      (s, d) => {
        val root = freshScratchRoot(s, "eo", d)
        val base = mergeFixtureBase(s, d)
        // late rows: the fixture's %1000==1 inserts (keys ≡1 mod 10/50 —
        // untouched by every merge below, so replay hazards stay
        // key-disjoint); token merge = the fixture's re-priced updates
        val lateRows = mergeFixtureInserts(base)
        val tokenMerge = mergeFixtureRepriced(base)
        val mt = ManifestTable.onObjectStore(s, root, new InMemoryObjectStore)
        mt.appendOnce(base, "ingest", batchId = 0L)
        mt.appendOnce(lateRows, "ingest", batchId = 1L)
        mt.appendOnce(lateRows, "ingest", batchId = 1L)     // replayed append: no-op
        mt.mergeOnce(tokenMerge, Seq("o_orderkey"), "upd", batchId = 0L)
        mt.merge(base.where(col("o_orderkey") % 50 === 0)   // interleaved writer
          .select(col("o_orderkey"), lit(-5.0).as("o_totalprice")), Seq("o_orderkey"))
        mt.mergeOnce(tokenMerge, Seq("o_orderkey"), "upd", batchId = 0L) // stale replay: no revert
        mt.snapshot().orderBy(col("o_orderkey"))
      },
      Some(s"""WITH $mergeFixtureBaseSql
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 50 = 0 THEN -5.0
               WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
               ELSE o_totalprice END AS o_totalprice
        FROM base
        UNION ALL
        SELECT o_orderkey + 10000000, 1.0 FROM base WHERE o_orderkey % 1000 = 1
        ORDER BY o_orderkey""")),

    QueryDef("q4_priority_check",
      // TPC-H Q4 shape (order priority checking): EXISTS-correlated
      // subquery planned as a LEFT SEMI hash join — the late-lineitem
      // predicate adapts Q4's commitdate/receiptdate (absent here)
      (s, d) => {
        val o = t(s, d, "orders").where(
          col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        val late = t(s, d, "lineitem")
          .where(col("l_shipdate") > expr("TIMESTAMP_NTZ '1997-06-01 00:00:00'"))
          .select(col("l_orderkey"))
        o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBySmall(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-06-01')
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q6_forecast",
      // TPC-H Q6 (forecasting revenue change): a pure scan-side query —
      // every predicate pushes to the parquet reader, zero joins, one
      // map-side-partial aggregation. The plan IS the point.
      (s, d) => t(s, d, "lineitem")
        .where(
          col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_rows")),
      Some(s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue, count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    QueryDef("q10_returned",
      // TPC-H Q10 shape (returned-item reporting): revenue lost to
      // returns per customer, dims broadcast, top 20 by revenue
      (s, d) => {
        val l = t(s, d, "lineitem").where(col("l_returnflag") === "R")
        val o = t(s, d, "orders").where(
          col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    QueryDef("q14_promo",
      // TPC-H Q14 (promotion effect): conditional aggregation over a
      // lineitem-part join; the promo share is ONE final division of two
      // decimal-exact sums, so the double is deterministic
      (s, d) => {
        val l = t(s, d, "lineitem").where(
          col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-03-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
        val p = t(s, d, "part")
        // part is SF-proportional (2M rows at SF10 is already marginal for
        // a broadcast) — sort-merge on the part key is the scale shape
        l.join(p.hint("merge"), col("l_partkey") === col("p_partkey"))
          .agg(
            dsum(when(col("p_type").startsWith("PROMO"),
              col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0)))
              .as("promo_revenue"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
          .select(col("promo_revenue"), col("total_revenue"),
            (col("promo_revenue") / col("total_revenue")).as("promo_share"))
      },
      Some(s"""WITH a AS (SELECT
          ${dsumSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS promo_revenue,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
        SELECT promo_revenue, total_revenue, promo_revenue / total_revenue AS promo_share FROM a""")),

    QueryDef("q18_large_orders",
      // TPC-H Q18 shape (large-volume customers): HAVING over a fact-side
      // pre-aggregation, then joins — the pre-agg shrinks the fact table
      // BEFORE any join touches it (the order that survives 100 TB)
      (s, d) => {
        val bigOrders = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .where(col("sum_qty") > 300)
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        bigOrders.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice, sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
          GROUP BY 1 HAVING sum(l_quantity) > 300) big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    QueryDef("q19_disjunct",
      // TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
      // OR of brand×size×quantity bands — Catalyst extracts the common
      // join key so this plans as a hash join with residual filter, NOT a
      // cartesian product
      (s, d) => {
        val l = t(s, d, "lineitem")
        val p = t(s, d, "part")
        val bands =
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30))
        l.join(p.hint("merge"), col("l_partkey") === col("p_partkey") && bands)
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""")),

    // ---- §2.1 sources ----
    QueryDef("op05_fixed_width",
      (s, d) => {
        val lines = t(s, d, "customer").select(
          concat(rpad(col("c_name"), 30, " "),
            lpad(col("c_custkey").cast("string"), 12, "0"),
            lpad(col("c_nationkey").cast("string"), 5, "0")).as("value"))
        Sources.fixedWidth(lines, "value", Seq(
            Sources.FixedField("name", 1, 30),
            Sources.FixedField("custkey_s", 31, 12),
            Sources.FixedField("natkey_s", 43, 5)))
          .select(col("name"), col("custkey_s").cast("long").as("custkey"),
            col("natkey_s").cast("int").as("natkey"))
          .orderBy(col("custkey"))
      },
      Some("""SELECT trim(substring(value, 1, 30)) AS name,
        CAST(trim(substring(value, 31, 12)) AS BIGINT) AS custkey,
        CAST(trim(substring(value, 43, 5)) AS INTEGER) AS natkey
        FROM (SELECT rpad(c_name, 30, ' ') || lpad(CAST(c_custkey AS VARCHAR), 12, '0')
          || lpad(CAST(c_nationkey AS VARCHAR), 5, '0') AS value FROM customer)
        ORDER BY custkey""")),

    QueryDef("op04_csv_permissive",
      // op 4's driver row via the op05 construct-and-parse trick: build
      // `;`-CSV lines from customer — one well-formed line per row, plus a
      // malformed line (unparseable custkey AND wrong field count) for
      // every 10th row — and run them through the REAL permissive reader
      // (same options/parser as the path form). DROPMALFORMED must drop
      // exactly the planted garbage, so the oracle is just the customer
      // projection. Lines go through the Dataset[String] form: same
      // univocity parse, no filesystem side effects in a verify query.
      (s, d) => {
        import s.implicits._
        val good = t(s, d, "customer").select(concat_ws(";",
          col("c_custkey"), col("c_name"), col("c_nationkey")).as("line"))
        val bad = t(s, d, "customer").where(col("c_custkey") % 10 === 0)
          .select(concat(lit("notakey;garbage-row-"), col("c_custkey")).as("line"))
        val lines = good.unionByName(bad).as[String]
        Sources.csvPermissiveLines(lines, sep = ";",
            schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
              "custkey BIGINT, name STRING, natkey BIGINT")))
          .orderBy(col("custkey"))
      },
      Some("""SELECT c_custkey AS custkey, c_name AS name, c_nationkey AS natkey
        FROM customer ORDER BY custkey""")),

    QueryDef("op06_glob_provenance",
      // op 6's driver row: materialize one real text file per region under
      // java.io.tmpdir (bounded: 5 regions at any SF), glob-discover them
      // with the REAL operator (spark.read.text + input_file_name), and
      // recover each row's provenance from the discovered path. The oracle
      // is the region projection the files were derived from.
      (s, d) => {
        // per-(kind, sfDir, PID) scratch with the shared dead-sibling
        // sweep: the previous bare per-dataset dir had no process
        // isolation, so two concurrent driver/bench JVMs could glob-read
        // files the other was truncating mid-rewrite (the op_merge_acid
        // lesson, applied to the one query that still side-stepped it)
        val dir = new java.io.File(scratchDir("op06", d))
        t(s, d, "region").select(col("r_regionkey"), col("r_name")).collect()
          .foreach { r =>
            val f = new java.io.File(dir, s"region_${r.get(0)}.txt")
            val w = new java.io.PrintWriter(f, "UTF-8")
            try w.print(r.getString(1) + "\n") finally w.close()
          }
        Sources.globText(s, dir.getAbsolutePath + "/region_*.txt")
          .select(
            regexp_extract(col("src_file"), "region_(\\d+)\\.txt", 1)
              .cast("long").as("regionkey"),
            col("value").as("name"))
          .orderBy(col("regionkey"))
      },
      Some("""SELECT r_regionkey AS regionkey, r_name AS name
        FROM region ORDER BY regionkey""")),

    QueryDef("op02_03_catalog_select",
      // ops 2+3 — JSON catalog → resource selection, driver-checkable via the
      // op05 construct-and-parse trick: build a data.gouv-style catalog JSON
      // per nation (2 csv + 1 json resources, ordered), then REAL
      // from_json parse → explode → format filter → bounded take. The bound
      // (1000) exceeds the match count so the take is deterministic; the
      // oracle mirrors the semantic output.
      (s, d) => {
        val n = t(s, d, "nation")
        val catalog = n.select(from_json(
            concat(
              lit("""{"resources":[{"format":"csv","latest":"https://f/"""),
              col("n_nationkey"), lit("""-a.csv","title":""""), col("n_name"), lit(""" a"},"""),
              lit("""{"format":"json","latest":"https://f/"""),
              col("n_nationkey"), lit("""-x.json","title":""""), col("n_name"), lit(""" x"},"""),
              lit("""{"format":"csv","latest":"https://f/"""),
              col("n_nationkey"), lit("""-b.csv","title":""""), col("n_name"), lit(""" b"}]}""")),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("resources",
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.StructType(Seq(
                    org.apache.spark.sql.types.StructField("format", org.apache.spark.sql.types.StringType),
                    org.apache.spark.sql.types.StructField("latest", org.apache.spark.sql.types.StringType),
                    org.apache.spark.sql.types.StructField("title", org.apache.spark.sql.types.StringType))))))))
          .as("c")).select(col("c.resources").as("resources"))
        Sources.selectResources(catalog, "csv", 1000)
          .orderBy(col("url"))
      },
      Some("""SELECT format, url, title FROM (
          SELECT 'csv' AS format, 'https://f/' || n_nationkey || '-a.csv' AS url, n_name || ' a' AS title FROM nation
          UNION ALL
          SELECT 'csv', 'https://f/' || n_nationkey || '-b.csv', n_name || ' b' FROM nation)
        ORDER BY url""")),

    QueryDef("op07_08_drop_rename",
      // ops 7+8 — column drop + bulk rename over a driver table
      (s, d) => Transforms.renameCols(
          Transforms.dropCols(t(s, d, "customer"), Seq("c_acctbal", "c_nationkey")),
          Map("c_name" -> "customer_name", "c_mktsegment" -> "segment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name AS customer_name, c_mktsegment AS segment
        FROM customer ORDER BY c_custkey""")),

    // ---- §2.2 transforms ----
    QueryDef("op09_dateparse",
      (s, d) => {
        val raw = when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyyMMdd"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .otherwise(lit("00000000"))
        // parse ABOVE the sort, not below it: a global orderBy evaluates
        // its child twice (the RangePartitioner sample job + the shuffle
        // map side), so an expensive expression under the Sort is paid
        // twice and its output shuffled; projected above, the sample and
        // the exchange see only (key, raw) and the parse runs once,
        // post-exchange (measured 2.6× on this key at sf1)
        t(s, d, "orders")
          .select(col("o_orderkey"), raw.as("raw"))
          .orderBy(col("o_orderkey"))
          .select(col("o_orderkey"), col("raw"),
            date_format(Transforms.parseDateMulti(col("raw")), "yyyy-MM-dd").as("parsed"))
      },
      Some("""SELECT o_orderkey, raw,
        strftime(coalesce(try_strptime(raw, '%Y%m%d'), try_strptime(raw, '%Y-%m-%d')), '%Y-%m-%d') AS parsed
        FROM (SELECT o_orderkey, CASE
            WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y%m%d')
            WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
            ELSE '00000000' END AS raw
          FROM orders) ORDER BY o_orderkey""")),

    QueryDef("op10_filter_valid",
      (s, d) => {
        val raw = when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyyMMdd"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .otherwise(lit("00000000"))
        val parsed = t(s, d, "orders").select(Transforms.parseDateMulti(raw).as("parsed"))
        Transforms.filterValid(parsed, Seq("parsed"))
          .groupBy(year(col("parsed")).as("yr")).agg(count(lit(1)).as("cnt"))
          .orderBySmall(col("yr"))
      },
      Some("""SELECT CAST(year(parsed) AS INTEGER) AS yr, count(*) AS cnt FROM (
        SELECT CAST(coalesce(try_strptime(raw, '%Y%m%d'), try_strptime(raw, '%Y-%m-%d')) AS DATE) AS parsed
        FROM (SELECT CASE
            WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y%m%d')
            WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
            ELSE '00000000' END AS raw
          FROM orders)) WHERE parsed IS NOT NULL GROUP BY 1 ORDER BY 1""")),

    QueryDef("op11_split_point",
      (s, d) => {
        val pos = concat((col("c_custkey") * 7 % 1200).cast("string"), lit(","),
          (col("c_custkey") * 13 % 3000).cast("string"))
        val (la, lo) = Transforms.splitPoint(pos)
        t(s, d, "customer")
          .select(col("c_custkey"), (la / 10.0 - 60.0).as("lat"), (lo / 10.0 - 150.0).as("lon"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
        CAST(split_part(pos, ',', 1) AS DOUBLE) / 10.0 - 60.0 AS lat,
        CAST(split_part(pos, ',', 2) AS DOUBLE) / 10.0 - 150.0 AS lon
        FROM (SELECT c_custkey, CAST(c_custkey * 7 % 1200 AS VARCHAR) || ',' ||
          CAST(c_custkey * 13 % 3000 AS VARCHAR) AS pos FROM customer)
        ORDER BY c_custkey""")),

    QueryDef("op12_hash_id",
      (s, d) => t(s, d, "customer")
        .select(col("c_custkey"),
          Transforms.hashId(Seq(col("c_name"), col("c_custkey").cast("string")), algo = "md5").as("id"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, md5(c_name || '|' || CAST(c_custkey AS VARCHAR)) AS id
        FROM customer ORDER BY c_custkey""")),

    QueryDef("op13_19_union_tag",
      (s, d) => {
        val o = t(s, d, "orders")
        val open = Transforms.tag(o.where(col("o_orderstatus") === "O"), "tag", "OPEN")
        val done = Transforms.tag(o.where(col("o_orderstatus") === "F"), "tag", "DONE")
        Aggregates.unionAligned(Seq(open, done))
          .groupBy(col("tag"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
          .orderBySmall(col("tag"))
      },
      Some(s"""SELECT tag, count(*) AS n, ${dsumSql("o_totalprice", 20, 2)} AS total FROM (
        SELECT 'OPEN' AS tag, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'DONE' AS tag, o_totalprice FROM orders WHERE o_orderstatus = 'F')
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op14_json",
      // json decode/encode ABOVE the sort (the op09 hoist): below it, the
      // RangePartitioner sample + the shuffle map side each pay the parse,
      // and both run at the SCAN's parallelism (a handful of row groups)
      // instead of the post-exchange task count (measured 8.7 → 2.0 s sf1)
      (s, d) => t(s, d, "events")
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          to_json(struct(col("event_id"))).as("enc")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        '{"event_id":' || CAST(event_id AS VARCHAR) || '}' AS enc
        FROM events ORDER BY event_id""")),

    // ---- §2.3 joins ----
    QueryDef("op15_broadcast_lookup",
      (s, d) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        Joins.broadcastLookup(
            Joins.broadcastLookup(c, n, col("c_nationkey") === col("n_nationkey")),
            r, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2).as("total_bal"))
          .orderBySmall(col("r_name"))
      },
      Some(s"""SELECT r_name, count(*) AS n_cust, ${dsumSql("c_acctbal", 20, 2)} AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op16_radius_join",
      (s, d) => {
        val c = custPoints(s, d)
        val su = suppPoints(s, d)
        Joins.radiusJoin(c, su,
            c("lat"), c("lon"), su("lat"), su("lon"),
            radiusKm = RadiusKm, latCellDeg = 3.0, lonCellDeg = 6.0)
          .select(col("c_custkey"), col("s_suppkey"))
          .orderBy(col("c_custkey"), col("s_suppkey"))
      },
      Some(s"""SELECT c_custkey, s_suppkey
        FROM ($custPointsSql) c CROSS JOIN ($suppPointsSql) s
        WHERE ${havSql("c.lat", "c.lon", "s.lat", "s.lon")} <= 300.0
        ORDER BY 1, 2""")),

    QueryDef("op16_radius_naive",
      // the same radius join written the naive way (crossJoin + haversine
      // filter); graft.plans.RadiusJoinRule rewrites it to the banded hash
      // join at optimization time — same oracle as op16_radius_join
      (s, d) => {
        graft.plans.Graft.install(s)
        val c = custPoints(s, d)
        val su = suppPoints(s, d)
        c.crossJoin(su)
          .where(Geo.haversineKm(c("lat"), c("lon"), su("lat"), su("lon")) <= lit(RadiusKm))
          .select(col("c_custkey"), col("s_suppkey"))
          .orderBy(col("c_custkey"), col("s_suppkey"))
      },
      Some(s"""SELECT c_custkey, s_suppkey
        FROM ($custPointsSql) c CROSS JOIN ($suppPointsSql) s
        WHERE ${havSql("c.lat", "c.lon", "s.lat", "s.lon")} <= 300.0
        ORDER BY 1, 2""")),

    QueryDef("op_range_join",
      // point-in-interval join over derived integer attributes: customers
      // carry a point, suppliers an interval; banded equi-join + exact filter
      (s, d) => {
        val p = t(s, d, "customer").select(col("c_custkey"),
          (col("c_custkey") * 17 % 10000).as("pt"))
        val iv = t(s, d, "supplier").select(col("s_suppkey"),
          (col("s_suppkey") * 97 % 9000).as("lo"),
          (col("s_suppkey") * 97 % 9000 + 150).as("hi"))
        Joins.rangeJoin(p, col("pt"), iv, col("lo"), col("hi"), 200.0)
          .select(col("c_custkey"), col("s_suppkey"))
          .orderBy(col("c_custkey"), col("s_suppkey"))
      },
      Some("""SELECT c_custkey, s_suppkey
        FROM (SELECT c_custkey, c_custkey * 17 % 10000 AS pt FROM customer) c
        JOIN (SELECT s_suppkey, s_suppkey * 97 % 9000 AS lo, s_suppkey * 97 % 9000 + 150 AS hi FROM supplier) s
        ON c.pt >= s.lo AND c.pt <= s.hi
        ORDER BY 1, 2""")),

    QueryDef("op_interval_join",
      // interval × interval overlap join (range_join is point × interval):
      // banded equi-join; each overlapping pair emitted exactly once at the
      // bucket holding max(start) — no distinct pass. Oracle runs the plain
      // quadratic join; results must coincide exactly
      (s, d) => {
        val a = t(s, d, "supplier").select(col("s_suppkey"),
          (col("s_suppkey") * 13 % 2000).as("a_lo"),
          (col("s_suppkey") * 13 % 2000 + 5 + col("s_suppkey") % 7).as("a_hi"))
        val b = t(s, d, "customer").select(col("c_custkey"),
          (col("c_custkey") * 11 % 2000).as("b_lo"),
          (col("c_custkey") * 11 % 2000 + 3 + col("c_custkey") % 5).as("b_hi"))
        Joins.intervalOverlapJoin(a, col("a_lo"), col("a_hi"),
            b, col("b_lo"), col("b_hi"), bucketSize = 8.0)
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_overlaps"), sum(col("c_custkey")).as("sum_cust"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_overlaps, CAST(sum(c_custkey) AS BIGINT) AS sum_cust
        FROM (SELECT s_suppkey, s_suppkey * 13 % 2000 AS a_lo,
                s_suppkey * 13 % 2000 + 5 + s_suppkey % 7 AS a_hi FROM supplier) a
        JOIN (SELECT c_custkey, c_custkey * 11 % 2000 AS b_lo,
                c_custkey * 11 % 2000 + 3 + c_custkey % 5 AS b_hi FROM customer) b
        ON greatest(a_lo, b_lo) <= least(a_hi, b_hi)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_zscore",
      // per-group standardization stats from exact decimal moments (the
      // feature-scaling primitive): mean/std are one shared IEEE expression
      // over exact sums, outliers an integer count — hash-stable without
      // emitting per-row doubles
      // sqScale 0dp: same 2⁵³-window hardening as op_regression/op_corr_matrix
      (s, d) => Analytics.standardizeStats(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_extendedprice"), zCut = 2.0, scale = 2, sqScale = 0)
        .withColumnRenamed("grp", "l_returnflag")
        .orderBySmall(col("l_returnflag")),
      Some("""WITH m AS (SELECT l_returnflag AS g, CAST(count(l_extendedprice) AS DOUBLE) AS n,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(24,2))) AS DOUBLE) AS s,
            CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,0))) AS DOUBLE) AS ss
          FROM lineitem GROUP BY 1),
        st AS (SELECT g, s / n AS mean, sqrt((ss - s * s / n) / n) AS std FROM m)
        SELECT l_returnflag, count(*) AS n_rows, max(mean) AS mean, max(std) AS std,
          CAST(sum(CASE WHEN abs(l_extendedprice - mean) > 2.0 * std THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM lineitem JOIN st ON l_returnflag = st.g
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_asof_join",
      (s, d) => {
        val ev = eventsUs(s, d)
        val probe = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val build = ev.where(col("event_type") === "signup")
          .select(col("user_id"), col("ts_us"))
        Joins.asofLastPrior(probe, build, "user_id", "ts_us", "signup_us")
          .select(col("event_id"), col("signup_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, b.bts AS signup_us
        FROM (SELECT event_id, user_id, epoch_us(ts) AS pts FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS bts FROM events WHERE event_type = 'signup') b
        ON p.user_id = b.user_id AND b.bts <= p.pts
        ORDER BY p.event_id""")),

    // ---- §2.4 aggregates / dedup / set ops ----
    QueryDef("op17_dedup_first",
      (s, d) => Aggregates.dedupFirst(t(s, d, "orders"), Seq("o_custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, o_orderkey FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
        ORDER BY o_custkey""")),

    QueryDef("op18_idempotent_insert",
      (s, d) => {
        val o = t(s, d, "orders")
        val existing = o.where(col("o_orderkey") % 3 === 0).select(col("o_orderkey"))
        val batch0 = o.where(col("o_orderkey") % 2 === 0).select(col("o_orderkey"))
        val batch = batch0.unionAll(batch0) // within-batch duplicates
        Aggregates.idempotentNewRows(batch, existing, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderkey % 2 = 0 AND o_orderkey NOT IN
          (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
        ORDER BY 1""")),

    QueryDef("op20_anti_ledger",
      (s, d) => {
        val discovered = t(s, d, "orders").select(col("o_custkey")).distinct()
        val imported = t(s, d, "customer").where(col("c_custkey") % 5 === 0)
          .select(col("c_custkey").as("o_custkey"))
        Joins.antiJoin(discovered, imported, Seq("o_custkey")).orderBy(col("o_custkey"))
      },
      Some("""SELECT DISTINCT o_custkey FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0)
        ORDER BY 1""")),

    QueryDef("op21_topk",
      (s, d) => Aggregates.topK(t(s, d, "orders"), 10,
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    QueryDef("op_window_rank",
      (s, d) => Analytics.rankTopN(t(s, d, "orders"),
          Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2, "rnk")
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk")),
      Some("""SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT o_custkey, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders) WHERE rnk <= 2 ORDER BY o_custkey, rnk""")),

    QueryDef("op_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("cnt"))
        .orderBySmall(col("flag"), col("status")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS cnt FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY 1, 2""")),

    QueryDef("op_cube",
      (s, d) => t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("cnt"), col("qty"))
        .orderBySmall(col("flag"), col("status")),
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS cnt, ${dsumSql("l_quantity", 20, 2)} AS qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY 1, 2""")),

    QueryDef("op_approx_distinct",
      // HLL++ sketch with a CERTIFIED-ACCURACY oracle: raw estimates are
      // implementation-defined across engines (DuckDB's HLL differs), so
      // instead of emitting them the query emits the exact distinct counts
      // plus per-group flags certifying |approx − exact| ≤ 3·rsd·exact —
      // the sketch's contract, checked deterministically (Spark's HLL++ is
      // deterministic for a given input, so the flags are stable at every
      // SF). The oracle asserts the exact counts and literal TRUE flags: a
      // broken sketch flips a flag and hash-mismatches.
      // exact and approx run as SEPARATE aggregations joined on the 3-row
      // result: mixing countDistinct with the HLL ImperativeAggregate in
      // one agg forces expand + sort-based aggregation (measured 50 s at
      // sf0.1 vs ~1 s split); the join is a broadcast of 3 rows
      (s, d) => {
        val li = t(s, d, "lineitem")
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
            countDistinct(col("l_partkey")).as("exact_parts"))
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.05).as("_a_orders"),
            approx_count_distinct(col("l_partkey"), 0.01).as("_a_parts"))
        exact.join(broadcast(approx), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
            (abs(col("_a_orders") - col("exact_orders")) <=
              col("exact_orders") * lit(0.15)).as("orders_within_3rsd"),
            (abs(col("_a_parts") - col("exact_parts")) <=
              col("exact_parts") * lit(0.03)).as("parts_within_3rsd"))
          .orderBySmall(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
          CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
          TRUE AS orders_within_3rsd, TRUE AS parts_within_3rsd
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_intersect",
      (s, d) => t(s, d, "orders").where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .intersect(t(s, d, "customer").where(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey")),
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY 1""")),

    QueryDef("op_except",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, d, "orders").select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey")),
      Some("""SELECT c_custkey AS custkey FROM customer
        EXCEPT SELECT o_custkey FROM orders ORDER BY 1""")),

    QueryDef("op_profile",
      (s, d) => Analytics.profileNumeric(t(s, d, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBySmall(col("col_name")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map(c =>
          s"""SELECT '$c' AS col_name, CAST(count($c) AS BIGINT) AS n,
            CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v FROM lineitem"""
        ).mkString("", " UNION ALL ", " ORDER BY col_name")
      }),

    QueryDef("op_outer_join",
      (s, d) => {
        val a = t(s, d, "customer").where(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k")).distinct().withColumn("in_a", lit(1))
        val b = t(s, d, "orders").where(col("o_custkey") % 3 === 0)
          .select(col("o_custkey").as("k")).distinct().withColumn("in_b", lit(1))
        a.join(b, Seq("k"), "full_outer")
          .select(col("k"), coalesce(col("in_a"), lit(0)).as("in_a"),
            coalesce(col("in_b"), lit(0)).as("in_b"))
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(a.k, b.k) AS k,
        CASE WHEN a.k IS NULL THEN 0 ELSE 1 END AS in_a,
        CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS in_b
        FROM (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 7 = 0) a
        FULL OUTER JOIN (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey % 3 = 0) b
        ON a.k = b.k ORDER BY k""")),

    QueryDef("op_nullsafe_join",
      // null-safe equality (<=>): null keys match each other, unlike =
      (s, d) => {
        val a = t(s, d, "orders")
          .select(when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_custkey")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_a"))
        val b = t(s, d, "customer")
          .select(when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_custkey")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n_b"))
        a.join(b, a("k") <=> b("k"))
          .select(a("k"), col("n_a"), col("n_b"))
          .orderBy(a("k").asc_nulls_first)
      },
      Some("""SELECT a.k, n_a, n_b FROM
        (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END AS k, count(*) AS n_a
          FROM orders GROUP BY 1) a
        JOIN (SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS k, count(*) AS n_b
          FROM customer GROUP BY 1) b
        ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY a.k NULLS FIRST""")),

    QueryDef("op_pivot",
      (s, d) => t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBySmall(col("yr")),
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_percentile",
      // one array-percentile aggregate: two scalar percentile() calls each
      // buffer the group's full value multiset (see op_approx_quantile's
      // comment — same fix, 2× buffer → 1×)
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(percentile(col("o_totalprice"), array(lit(0.5), lit(0.95))).as("_ps"))
        .select(col("o_orderstatus"),
          col("_ps")(0).as("p50"), col("_ps")(1).as("p95"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.95) AS p95
        FROM orders GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_approx_quantile",
      // Greenwald-Khanna rank sketch (percentile_approx) with a CERTIFIED-
      // accuracy oracle, same technique as op_approx_distinct: the sketch's
      // contract is that its answer is a real data value within rank-ε of
      // the target (ε = 1/accuracy = 0.001 here), certified by bracketing
      // between the exact percentiles at p ± 0.01 (10× margin). The query
      // emits the exact percentiles plus the bracket flags; raw sketch
      // values are engine-specific and never appear in the output.
      // ONE array-percentile aggregate for all six exact cut points and one
      // for both sketch probes: each scalar percentile()/percentile_approx()
      // call is its own ImperativeAggregate with its OWN per-group buffer —
      // the scalar form held the group's value multiset 6× (and the GK
      // sketch 2×); the array form buffers each once (measured 9.15 →
      // 2.4 s at sf0.3, 26.0 → 5.3 s at sf1). Output values are
      // bit-identical: same aggregator, same per-percentile interpolation.
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(percentile(col("o_totalprice"),
            array(lit(0.5), lit(0.95), lit(0.49), lit(0.51), lit(0.94), lit(0.96))).as("_ps"),
          percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.95)),
            lit(1000)).as("_as"))
        .select(col("o_orderstatus"), col("_ps")(0).as("p50"), col("_ps")(1).as("p95"),
          (col("_as")(0) >= col("_ps")(2) && col("_as")(0) <= col("_ps")(3)).as("p50_within_eps"),
          (col("_as")(1) >= col("_ps")(4) && col("_as")(1) <= col("_ps")(5)).as("p95_within_eps"))
        .orderBySmall(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS p50,
        quantile_cont(o_totalprice, 0.95) AS p95,
        TRUE AS p50_within_eps, TRUE AS p95_within_eps
        FROM orders GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_grouping_sets",
      (s, d) => t(s, d, "orders")
        .groupingSets(Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("o_orderstatus"), lit("-")).as("status"),
          coalesce(col("o_orderpriority"), lit("-")).as("prio"), col("cnt"))
        .orderBySmall(col("status"), col("prio")),
      Some("""SELECT coalesce(o_orderstatus, '-') AS status, coalesce(o_orderpriority, '-') AS prio,
        count(*) AS cnt FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY 1, 2""")),

    QueryDef("op_except_all",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("custkey"))
        .exceptAll(t(s, d, "orders").where(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("custkey")),
      Some("""SELECT custkey, count(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_count_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n"))
        .orderBySmall(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        count(*) AS n FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- §3.3 production analytics ----
    QueryDef("q_plant_deaths",
      (s, d) => {
        val c = custPoints(s, d)
        val su = suppPoints(s, d)
        val pairs = Joins.radiusJoin(c, su, c("lat"), c("lon"), su("lat"), su("lon"),
            RadiusKm, 3.0, 6.0)
          .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
        t(s, d, "supplier").select(col("s_suppkey"))
          .join(pairs, Seq("s_suppkey"), "left_outer")
          .select(col("s_suppkey"), coalesce(col("n"), lit(0L)).as("n_deaths"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""SELECT s_suppkey, coalesce(n, 0) AS n_deaths FROM supplier
        LEFT JOIN (SELECT s.s_suppkey AS k, count(*) AS n
          FROM ($custPointsSql) c CROSS JOIN ($suppPointsSql) s
          WHERE ${havSql("c.lat", "c.lon", "s.lat", "s.lon")} <= 300.0
          GROUP BY 1) sub ON s_suppkey = k
        ORDER BY s_suppkey""")),

    QueryDef("q_yearly",
      (s, d) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
          .select(col("c_custkey"), (lit(1995) + col("c_custkey") % 5).as("active_year"))
        Analytics.yearlyActive(
            o.join(c.hint("merge"), col("o_custkey") === col("c_custkey")),
            col("o_orderdate"), col("active_year"), Seq(col("o_orderstatus")))
          .orderBySmall(col("yr"), col("o_orderstatus"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderstatus, count(*) AS cnt
        FROM orders JOIN (SELECT c_custkey, 1995 + c_custkey % 5 AS active_year FROM customer) c
        ON o_custkey = c_custkey
        WHERE year(o_orderdate) >= active_year
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q_heatmap",
      (s, d) => Analytics.heatmap(custPoints(s, d), col("lat"), col("lon"), 3.0, 6.0)
        .orderBySmall(col("cell_x"), col("cell_y")),
      Some(s"""SELECT CAST(floor(lat / 3.0) AS BIGINT) AS cell_x,
        CAST(floor(lon / 6.0) AS BIGINT) AS cell_y, count(*) AS cnt
        FROM ($custPointsSql) GROUP BY 1, 2 ORDER BY 1, 2""")),
  )
}
