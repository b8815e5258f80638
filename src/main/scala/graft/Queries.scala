package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.functions.Geo

/** One driver-checkable query: a Spark plan + (optionally) the ANSI SQL the
  * DuckDB oracle runs over the same parquet tables. Both sides must produce
  * identical column names, identical types, identical values, and a
  * deterministic row order (every query ends in an explicit ORDER BY on both
  * sides).
  *
  * Numeric discipline (why every aggregate looks the way it does):
  *  - sums of money-ish doubles go through DECIMAL so the result is exact
  *    and independent of summation order (Spark and DuckDB add partitions in
  *    different orders; double addition is not associative, decimal is);
  *    the final value is cast back to DOUBLE, which is a deterministic
  *    conversion of an exact value.
  *  - counts are cast to BIGINT on the DuckDB side (DuckDB sums/counts of
  *    INTEGER widen to HUGEINT).
  *  - event timestamps are nanosecond INT64 (read as long via
  *    `nanosAsLong`); all event queries work in integer microseconds
  *    (`ts div 1000` == DuckDB `epoch_us(ts)`), never float seconds.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** ORDER BY for results whose cardinality is BOUNDED BY CONSTRUCTION —
    * fixed group domains (returnflag, priority, nation, grid cells, years)
    * or operator contracts that already bound the output (top-k over a
    * bounded query set). A range-exchange `orderBy` costs a separate
    * sampling JOB that re-executes the child plan (the per-query 2-job
    * floor on the driver); for a result that stays metadata-sized at ANY
    * scale factor, a single-partition sort is the plan you'd want at
    * 100 TB too — the distributed work all happens below the coalesce.
    * NOT for SF-growing outputs (per-doc scores, pair lists, ANN results
    * over a %-sampled query set), NOT for SF-growing per-row payloads
    * (collect_list CSVs — group count bounded but sum-of-groups memory in
    * one task is not), and NOT above aggregates with unbounded per-group
    * buffers (built-in `percentile`) where the single final-merge task
    * would hold every group's buffer at once: all of those keep the
    * parallel range sort.
    */
  private implicit class BoundedResultOps(df: DataFrame) {
    def orderBySmall(cols: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
  }

  // ------------------------------------------------------------------
  // Derived deterministic geo points (the testdata has no coordinates; the
  // reference's flagship is a spatial radius join, so we derive stable
  // lat/lon from integer keys — identical integer arithmetic in both
  // engines, exact decimal-by-integer division).
  // lat ∈ [-60, 60), lon ∈ [-150, 150), 0.1° grid.
  // ------------------------------------------------------------------
  private def custPoints(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey"),
      ((col("c_custkey") * 7 % 1200) / lit(10.0) - 60.0).as("lat"),
      ((col("c_custkey") * 13 % 3000) / lit(10.0) - 150.0).as("lon"))

  private def suppPoints(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier").select(col("s_suppkey"),
      ((col("s_suppkey") * 91 % 1200) / lit(10.0) - 60.0).as("lat"),
      ((col("s_suppkey") * 53 % 3000) / lit(10.0) - 150.0).as("lon"))

  private val custPointsSql =
    "SELECT c_custkey, (c_custkey * 7 % 1200) / 10.0 - 60.0 AS lat, (c_custkey * 13 % 3000) / 10.0 - 150.0 AS lon FROM customer"
  private val suppPointsSql =
    "SELECT s_suppkey, (s_suppkey * 91 % 1200) / 10.0 - 60.0 AS lat, (s_suppkey * 53 % 3000) / 10.0 - 150.0 AS lon FROM supplier"

  // URL-bearing document text, constructed deterministically (the corpus
  // has no URLs — same construct-and-parse trick as op05): every doc cites
  // a subdomain of its source's .org and a mixed-case .net mirror. The SQL
  // fragment defines CTEs d2 (text2) / h (lowercased hosts) / rd (eTLD+1),
  // mirroring Web.urlHosts + Web.registeredDomain exactly.
  private def urlDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("text2",
      concat(col("text"),
        lit(" see https://sub"), pmod(col("doc_id"), lit(7)).cast("string"),
        lit("."), col("source"), lit(".org/d/"), col("doc_id").cast("string"),
        lit(" and http://Mirror."), col("source"), lit(".net/x")))

  private val urlDocsSql: String =
    """d2 AS (SELECT doc_id, source,
        text || ' see https://sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.org/d/'
          || CAST(doc_id AS VARCHAR) || ' and http://Mirror.' || source || '.net/x' AS text2
      FROM documents),
    h AS (SELECT doc_id, regexp_replace(lower(unnest(regexp_extract_all(text2, '(?i)https?://(?:[A-Za-z0-9._%+:-]*@)?([A-Za-z0-9.-]+)', 1))), '[.-]+$', '') AS host
      FROM d2),
    rd AS (SELECT doc_id, CASE WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1) = '' THEN host
        ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS domain FROM h)"""

  /** DuckDB mirror of [[graft.ops.Analytics.dyadicEwma]]'s BIGINT lag
    * chain, generated from the same term count so the weights can never
    * drift from the Spark side.
    */
  private def ewmaOracleSql(terms: Int): String = {
    val num = (0 until terms).map { k =>
      s"COALESCE(lag(v_milli, $k) OVER w, 0) * ${1L << (terms - 1 - k)}"
    }.mkString(" + ")
    s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        CAST(floor(value * 1000) AS BIGINT) AS v_milli FROM events)
      SELECT user_id, event_id, ts_us, v_milli,
        CAST($num AS BIGINT) AS ewma_num,
        CAST($num AS DOUBLE) / ${(1L << terms) * 1000}.0 AS ewma
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ORDER BY user_id, ts_us, event_id"""
  }

  /** Deterministically constructed HTML page per document (the corpus has
    * no markup — the op05 construct-and-parse pattern): a head with title
    * and style, a body-level script, an entity-bearing paragraph wrapping
    * the document text, one anchor, and a comment. [[Web.stripHtml]] must
    * recover exactly `"A & B: <text> more <doc_id>"` — head/script/style/
    * comment content must vanish, the anchor text must survive, and
    * `&amp;` must single-decode.
    */
  private def htmlDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("html",
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style></head><body>" +
          "<script>var x=1&amp;2;</script><p>A &amp; B: "),
        col("text"),
        lit("</p><a href=\"https://sub"), pmod(col("doc_id"), lit(7L)).cast("string"),
        lit("."), col("source"), lit(".org/d/"), col("doc_id").cast("string"),
        lit("\">more "), col("doc_id").cast("string"),
        lit("</a><!-- tracker --></body></html>")))

  private val htmlDocsSql: String =
    """hd AS (SELECT doc_id, source, text,
        '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        '</title><style>p{color:red}</style></head><body><script>var x=1&amp;2;</script><p>A &amp; B: ' ||
        text || '</p><a href="https://sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source ||
        '.org/d/' || CAST(doc_id AS VARCHAR) || '">more ' || CAST(doc_id AS VARCHAR) ||
        '</a><!-- tracker --></body></html>' AS html
      FROM documents)"""

  /** DuckDB mirror of [[graft.ops.Web.stripHtml]]: the identical pattern
    * chain over an input CTE `$src`(…, $htmlCol) → CTE `ext` with every
    * `$src` column plus `extracted`. Kept adjacent to the canonical-URL
    * mirror for the same no-drift reason.
    */
  private def stripHtmlCteSql(src: String, htmlCol: String): String =
    s"""sh1 AS (SELECT *, regexp_replace($htmlCol, '(?is)<head\\b[^>]*>.*?</head>', ' ', 'g') AS sh_a FROM $src),
      sh2 AS (SELECT *, regexp_replace(regexp_replace(sh_a, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g') AS sh_b FROM sh1),
      sh3 AS (SELECT *, regexp_replace(regexp_replace(sh_b, '(?s)<!--.*?-->', ' ', 'g'),
        '(?s)<[^>]*>', ' ', 'g') AS sh_c FROM sh2),
      ext AS (SELECT *, trim(regexp_replace(
          replace(replace(replace(replace(replace(sh_c,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
          '\\s+', ' ', 'g')) AS extracted
        FROM sh3)"""

  /** DuckDB mirror of [[graft.ops.Web.canonicalizeUrl]] as chained CTEs
    * over `src`(doc_id, url) → CTE `canon`(doc_id, canonical_url). One
    * definition feeds every canonical-URL oracle (web_url_dedup, the web
    * curation funnel) so the regexp chain can never drift between them.
    */
  private def canonicalCteSql(src: String): String =
    s"""cp AS (SELECT doc_id,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
          regexp_replace(lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
            '^[a-z0-9._%+:-]*@', '') AS hostport,
          regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
        FROM $src),
      cq AS (SELECT doc_id, scheme,
          CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
               WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
               ELSE hostport END AS host,
          regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$$', '') AS p1,
          regexp_replace(regexp_replace('&' || regexp_extract(rest, '\\?(.*)$$', 1),
            '&utm_[A-Za-z_]*=[^&]*', '', 'g'), '^&+', '') AS qs
        FROM cp),
      canon AS (SELECT doc_id, scheme || '://' || host ||
          CASE WHEN p1 = '' THEN '/' ELSE p1 END ||
          CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url
        FROM cq)"""

  // ---- planted-pair corpus for the xxhash64 dedup family ----------------
  // DuckDB cannot evaluate xxhash64, so the fast MinHash/SimHash forms are
  // oracled the emb_near_dup way: make the EXPECTED output analytic instead
  // of mirroring the hash. Every token is suffixed with its doc's id, so
  // distinct docs share ZERO tokens (and zero shingles — cross-doc Jaccard
  // is exactly 0 and simhashes are independent), then a verbatim copy of
  // every doc is planted at id −doc_id−1 (collision-free with the
  // nonnegative real ids at any SF). Identical text ⇒ identical signatures
  // ⇒ same bucket in every band ⇒ guaranteed LSH candidates, and the exact
  // verify scores them jac=1.0 / hamming=0 — so the expected result is
  // precisely one (−id−1, id) pair per qualifying doc, asserting 100%
  // recall on planted pairs AND zero false positives in one hash compare.
  private def plantedTokenDocs(s: SparkSession, d: String): DataFrame = {
    val uniq = t(s, d, "documents").select(col("doc_id"),
      array_join(transform(ops.TextAnalysis.tokens(col("text")),
        tk => concat(tk, lit("_"), col("doc_id"))), " ").as("text"))
    uniq.unionByName(
      uniq.select((-col("doc_id") - 1).as("doc_id"), col("text")))
  }

  // ---- integer-lattice embedding construct (shared by the IVF oracles) --
  // An 8-dim derivation of vec_id with values in [-5,7]: small integers are
  // exact in float32 AND double, so per-dim centroid sums are exact in any
  // partition order, means are one correctly-rounded division, and every
  // cosine is exactly-rounded (*,/,sqrt) arithmetic both engines hash-agree
  // on. Dim 0 is id%7+1 >= 1, so no zero-norm vector at any SF; multipliers
  // are coprime to the 11 modulus.
  private val LatDims = 8
  private val LatMults = Seq(3, 5, 7, 9, 13, 15, 17)
  private def latticeVec: Column =
    array((pmod(col("vec_id"), lit(7L)) + 1).cast("double") +:
        LatMults.map(m => (pmod(col("vec_id") * lit(m.toLong), lit(11L)) - 5).cast("double")): _*)
      .cast("array<float>")
  private val latticeSqlList: String =
    ("CAST(vec_id % 7 + 1 AS DOUBLE)" +:
      LatMults.map(m => s"CAST((vec_id * $m) % 11 - 5 AS DOUBLE)")).mkString("[", ",\n       ", "]")
  private val latticeBaseCte: String =
    s"base AS (SELECT vec_id, label, $latticeSqlList AS v FROM embeddings)"
  /** The bounded ANN query-set contract, enforced: queries are the
    * `vec_id % 10` decimation CAPPED at `vec_id < 2048`. At the driver SFs
    * the cap is vacuous (max vec_id 1999 at sf0.1), so every gate hash is
    * unchanged; at corpus scale it pins the query-side CARDINALITY to a
    * constant so the exact / ADC / IVF-probe scans stay LINEAR in the
    * corpus — an uncapped `% 10` query side made them O(corpus²/10), which
    * the sf0.3→sf1 linearity sweep caught as ann_pq_topk growing 4.6× on
    * 3.3× data (SCALE.md). A production serving path takes its (bounded)
    * query batch from the caller; `% 10 < cap` is this suite's stand-in.
    */
  private def annQueryPred: Column =
    col("vec_id") % 10 === 0 && col("vec_id") < 2048L
  // product-grid PQ codebooks for ann_pq_topk: 4 × 2-dim subspaces, codes =
  // the even lattice {-4,-2,0,2,4,6}² in lexicographic (a-major) order so
  // "lowest code index" == "lexicographically smallest entry" — see the
  // query's comment for why that makes the real argmin SQL-analytic
  private val pqGrid = Seq(-4.0, -2.0, 0.0, 2.0, 4.0, 6.0)
  private val pqGridBook: Array[Array[Double]] =
    (for (a <- pqGrid; b <- pqGrid) yield Array(a, b)).toArray
  private val pqGridBooks: Array[Array[Array[Double]]] = Array.fill(4)(pqGridBook)
  /** The DuckDB spelling of [[Similarity.cosine]]'s exact arithmetic. */
  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $LatDims), i -> $a[i] * $b[i])) / " +
      s"(sqrt(list_sum(list_transform(generate_series(1, $LatDims), i -> $a[i] * $a[i]))) * " +
      s"sqrt(list_sum(list_transform(generate_series(1, $LatDims), i -> $b[i] * $b[i]))))"
  /** Per-`grp` exact mean vectors of `src`(vec list col `v`) as CTE `out`. */
  private def meanCteSql(src: String, grp: String, out: String): String =
    s"""$out AS (SELECT $grp, list(cv ORDER BY dim) AS c FROM (
          SELECT $grp, dim, sum(val) / count(*) AS cv FROM (
            SELECT $grp, unnest(generate_series(1, $LatDims)) AS dim, unnest(v) AS val FROM $src)
          GROUP BY 1, 2) GROUP BY 1)"""
  /** The route → probe → score → rank tail shared by both IVF oracles:
    * queries (vec_id % 10 = 0) from `src` against centroid CTE `cent`
    * keyed by `lbl`, nprobe probes, top-5 by (sim desc, id).
    */
  private def ivfTailSql(src: String, lbl: String, nprobe: Int): String =
    s"""routed AS (SELECT s.vec_id AS qid, s.v AS qv, cent.$lbl,
            ${cosSql("s.v", "cent.c")} AS c_sim
          FROM $src s CROSS JOIN cent WHERE s.vec_id % 10 = 0 AND s.vec_id < 2048),
        probes AS (SELECT qid, qv, $lbl FROM (
            SELECT qid, qv, $lbl,
              row_number() OVER (PARTITION BY qid ORDER BY c_sim DESC, $lbl ASC) AS pr
            FROM routed) WHERE pr <= $nprobe),
        scored AS (SELECT p.qid, s.vec_id AS nid, ${cosSql("p.qv", "s.v")} AS sim
          FROM probes p JOIN $src s ON p.$lbl = s.$lbl WHERE s.vec_id <> p.qid)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
          FROM scored) WHERE rank <= 5 ORDER BY query_id, rank"""
  /** `iters` unrolled Lloyd's rounds over `base` (seeds: k smallest
    * `(md5(id), id)` — the engine-portable seedKey the query passes), each
    * round = assign (argmax cosine, ties lowest centroid) + exact lattice
    * means with empty-cluster carryover. Produces CTEs c0..c`iters`.
    */
  private def kmeansCtesSql(k: Int, iters: Int, src: String = "base"): String = {
    val c0 = s"""c0 AS (SELECT j, v AS c FROM (
        SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j, v
        FROM $src) WHERE j < $k)"""
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (SELECT vec_id, v, j FROM (
            SELECT b.vec_id, b.v, c.j,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM $src b CROSS JOIN c${i - 1} c) WHERE rn = 1),
        ${meanCteSql(s"a$i", "j", s"m$i")},
        c$i AS (SELECT p.j, COALESCE(m.c, p.c) AS c FROM c${i - 1} p LEFT JOIN m$i m ON p.j = m.j)"""
    }
    (c0 +: rounds).mkString(",\n        ")
  }

  /** SQL mirror of [[graft.ops.Analytics.det3]] — the same 3×3 Cramer
    * expression tree as text, so the ml_ols_multi oracle can never drift
    * from the Spark evaluation order.
    */
  private def det3Sql(a: Seq[Seq[String]]): String =
    s"(${a(0)(0)} * (${a(1)(1)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(1)}) - " +
      s"${a(0)(1)} * (${a(1)(0)} * ${a(2)(2)} - ${a(1)(2)} * ${a(2)(0)}) + " +
      s"${a(0)(2)} * (${a(1)(0)} * ${a(2)(1)} - ${a(1)(1)} * ${a(2)(0)}))"

  /** Deterministic per-(kind, sfDir, PID) scratch directory for the
    * write→read-back roundtrip queries. The path is FIXED for a given
    * input dir WITHIN a JVM and overwritten in place on every
    * invocation, so repeated bench iterations reuse one directory (and,
    * for JDBC, one embedded Derby database booted once per JVM). The
    * PID suffix keeps two concurrent driver/bench processes on the same
    * host from clobbering each other's scratch mid-query (the
    * op_merge_acid lesson); sibling PIDs' dirs whose pid is dead are
    * swept so finished JVMs don't leak scratch forever.
    *
    * The sweep is MEMOIZED per (kind, hash) with a 1-hour TTL: leaked
    * dirs only appear when a sibling JVM exits, so re-listing /tmp on
    * every bench iteration of the same query is pure directory-scan
    * overhead (and on a loaded host, measurable jitter in the hot loop).
    * The TTL (rather than once-per-JVM) bounds /tmp growth in a
    * long-lived SERVICE posture: a sibling that dies after this JVM's
    * first sweep of the prefix is reclaimed within the hour instead of
    * never.
    */
  private val scratchSwept =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val ScratchSweepTtlMs = 3600L * 1000
  private def scratchDir(kind: String, d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val tmp = sys.props("java.io.tmpdir")
    val prefix = s"graft_rt_${kind}_${h}_"
    val name = prefix + ProcessHandle.current().pid()
    // reclaim dirs whose owning pid is dead: an mtime-age sweep can
    // delete a LIVE sibling's scratch (Derby writes touch files nested
    // under db/, so the TOP dir's mtime never refreshes — a >1h-old run
    // looks stale while in active use; that also means the top dir's
    // mtime IS its creation time). Pid liveness alone SURVIVES PID REUSE
    // — an unrelated process recycling a dead JVM's pid would pin its
    // dir forever. The precise disambiguator is the holder's START TIME:
    // a pid is held by one process at a time, so any live holder that
    // started AFTER the dir appeared cannot be the JVM that created it
    // (the creator died first and its pid was recycled) → sweep. A real
    // live sibling started BEFORE it created its dir → keep, at ANY age
    // (an age floor here would sweep a >floor-old live sibling — the
    // exact deletion the pid rule exists to prevent). The 1-minute slack
    // absorbs clock/fs skew on the creator's start≈mtime boundary; when
    // the start time is unavailable, and for dirs whose suffix doesn't
    // parse as a pid (the legacy unsuffixed layout), a 7-day floor is
    // the conservative fallback. The recursive delete tolerates a
    // concurrent sibling sweeping the same dead dir (walk/delete races
    // surface as ignorable IO errors).
    val nowMs = System.currentTimeMillis()
    val sweepDue = {
      val prev = scratchSwept.get(prefix)
      (prev == null || nowMs - prev > ScratchSweepTtlMs) &&
        // one winner per expiry window even under concurrent callers
        (if (prev == null) scratchSwept.putIfAbsent(prefix, nowMs) == null
         else scratchSwept.replace(prefix, prev, java.lang.Long.valueOf(nowMs)))
    }
    if (sweepDue) {
      val floorMs = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
      val stale = new java.io.File(tmp).listFiles()
      if (stale != null) stale.iterator
        .filter(f => f.getName.startsWith(prefix) && f.getName != name)
        .filter { f =>
          f.getName.stripPrefix(prefix).toLongOption match {
            case Some(pid) =>
              val holder = ProcessHandle.of(pid)
              if (!holder.isPresent) true // owner dead
              else {
                val started = holder.get.info().startInstant()
                if (started.isPresent)
                  started.get.toEpochMilli > f.lastModified() + 60000L // pid reused
                else f.lastModified() < floorMs
              }
            case None => f.lastModified() < floorMs
          }
        }
        .foreach { f =>
          try
            java.nio.file.Files.walk(f.toPath).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
          catch { case scala.util.control.NonFatal(_) => () }
        }
    }
    val p = java.nio.file.Paths.get(tmp, name)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** op_schema_drift oracle: per-column profile blocks are mechanical —
    * generate them (null/distinct census per column per side, then the
    * same full-outer shape the Spark side builds).
    */
  private def profileDriftOracleSql(v1Cols: Seq[String], v2Cols: Seq[String]): String = {
    def side(name: String, cols: Seq[String]): String = cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM $name"""
    }.mkString("\nUNION ALL ")
    s"""WITH v1 AS (SELECT ${v1Cols.mkString(", ")} FROM orders WHERE o_orderkey % 2 = 0),
      v2 AS (SELECT orders.*, CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE 'web' END AS o_channel
        FROM orders WHERE o_orderkey % 3 <> 0),
      p1 AS (${side("v1", v1Cols)}),
      p2 AS (${side("v2", v2Cols)})
      SELECT coalesce(p1.column_name, p2.column_name) AS column_name,
        p1.column_name IS NOT NULL AS in_v1, p2.column_name IS NOT NULL AS in_v2,
        coalesce(p1.n_rows, 0) AS n_rows_v1, coalesce(p1.n_nulls, 0) AS n_nulls_v1,
        coalesce(p1.n_distinct, 0) AS n_distinct_v1,
        coalesce(p2.n_rows, 0) AS n_rows_v2, coalesce(p2.n_nulls, 0) AS n_nulls_v2,
        coalesce(p2.n_distinct, 0) AS n_distinct_v2
      FROM p1 FULL OUTER JOIN p2 ON p1.column_name = p2.column_name
      ORDER BY column_name"""
  }

  /** Unrolled batch-perceptron oracle: pure INTEGER arithmetic end to end
    * (weights, margins, updates), so parity needs no float reasoning at
    * all — each round is one CTE carrying the weight triple forward.
    * Mirrors [[graft.ops.Analytics.perceptronFit]] exactly: update
    * w += Σ y·x over rows with y·margin <= 0, bias as a constant feature.
    */
  private def perceptronOracleSql(iters: Int): String = {
    val f = """f AS (SELECT doc_id, CAST(doc_id % 7 AS BIGINT) AS f1,
        CAST(doc_id % 11 AS BIGINT) AS f2,
        CASE WHEN 2 * (doc_id % 7) - (doc_id % 11) + 1 > 0 THEN 1 ELSE -1 END AS y
      FROM documents)"""
    val w0 = "w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c)"
    val ws = (1 to iters).map { i =>
      val p = i - 1
      s"""w$i AS (SELECT
          w$p.a + COALESCE(sum(CASE WHEN y * (w$p.a * f1 + w$p.b * f2 + w$p.c) <= 0 THEN y * f1 END), 0) AS a,
          w$p.b + COALESCE(sum(CASE WHEN y * (w$p.a * f1 + w$p.b * f2 + w$p.c) <= 0 THEN y * f2 END), 0) AS b,
          w$p.c + COALESCE(sum(CASE WHEN y * (w$p.a * f1 + w$p.b * f2 + w$p.c) <= 0 THEN y END), 0) AS c
        FROM f CROSS JOIN w$p GROUP BY w$p.a, w$p.b, w$p.c)"""
    }
    s"""WITH $f,
        $w0,
        ${ws.mkString(",\n        ")}
      SELECT y AS label,
        CASE WHEN w$iters.a * f1 + w$iters.b * f2 + w$iters.c > 0 THEN 1 ELSE -1 END AS pred,
        count(*) AS n
      FROM f CROSS JOIN w$iters GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  private val RadiusKm = 300.0
  private def havSql(a1: String, o1: String, a2: String, o2: String) =
    Geo.haversineKmSql(a1, o1, a2, o2)

  /** sum(DECIMAL(p,s))::DOUBLE both sides — see numeric discipline above. */
  private def dsum(c: Column, p: Int = 24, sc: Int = 6): Column =
    sum(c.cast(s"decimal($p,$sc)")).cast("double")
  private def dsumSql(e: String, p: Int = 24, s: Int = 6): String =
    s"CAST(sum(CAST($e AS DECIMAL($p,$s))) AS DOUBLE)"

  /** events with ts converted to exact integer microseconds.
    *
    * The driver's events.parquet carries nanosecond timestamps; depending on
    * the Spark build, `spark.sql.legacy.parquet.nanosAsLong` either maps them
    * to LongType nanos (older behavior) or is ignored and they arrive as
    * TIMESTAMP_NTZ truncated to micros (current behavior — the round-8 bench
    * lost all 8 event queries to the unhandled second shape). Branch on the
    * RESOLVED schema so both read paths yield the same integer microseconds:
    * `unix_micros` needs TIMESTAMP_LTZ, and the NTZ→LTZ cast is identity
    * because Prep pins the session timezone to UTC.
    */
  private def eventsUs(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val tsUs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    ev.withColumn("ts_us", tsUs)
  }

  // ------------------------------------------------------------------

  val all: Seq[QueryDef] = Seq(

    // ---- headline relational aggregations (TPC-H-shaped) ----
    QueryDef("q1_pricing",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice"), 20, 2).as("sum_base"),
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
        val base = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val updates = base.where(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(base.where(col("o_orderkey") % 1000 === 1)
            .select((col("o_orderkey") + 10000000).as("o_orderkey"),
              lit(1.0).as("o_totalprice")))
        Aggregates.upsert(base, updates, Seq("o_orderkey"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 10000000, 1.0 FROM base WHERE o_orderkey % 1000 = 1)
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
        val tmpDir = System.getProperty("java.io.tmpdir")
        val prefix = "graft_acid_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        // pid-suffixed roots from FINISHED JVMs never get re-entered, so
        // without a sweep each verify/bench run would leak two orders-table
        // copies in tmp forever; the 1h age guard keeps a concurrently
        // LIVE run's table safe from the sweep
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getName != rp.getName)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true))
        fs.delete(rp, true)
        val base = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val updates = base.where(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(base.where(col("o_orderkey") % 1000 === 1)
            .select((col("o_orderkey") + 10000000).as("o_orderkey"),
              lit(1.0).as("o_totalprice")))
        val mt = ManifestTable(s, root)
        mt.overwrite(base)
        mt.merge(updates, Seq("o_orderkey"))
        mt.snapshot().orderBy(col("o_orderkey"))
      },
      Some("""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 10000000, 1.0 FROM base WHERE o_orderkey % 1000 = 1)
        SELECT b.o_orderkey, b.o_totalprice FROM base b
          WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM upd
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
        val dir = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_op06_${d.hashCode.toHexString}")
        dir.mkdirs()
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
        t(s, d, "orders")
          .select(col("o_orderkey"), raw.as("raw"),
            date_format(Transforms.parseDateMulti(raw), "yyyy-MM-dd").as("parsed"))
          .orderBy(col("o_orderkey"))
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
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 20, 2).as("total"))
          .orderBySmall(col("tag"))
      },
      Some(s"""SELECT tag, count(*) AS n, ${dsumSql("o_totalprice", 20, 2)} AS total FROM (
        SELECT 'OPEN' AS tag, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT 'DONE' AS tag, o_totalprice FROM orders WHERE o_orderstatus = 'F')
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op14_json",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          to_json(struct(col("event_id"))).as("enc"))
        .orderBy(col("event_id")),
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
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 20, 2).as("total_bal"))
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
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity"), 20, 2).as("qty"))
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

    // ---- events: sessionization + windows (batch forms of §2.6) ----
    QueryDef("op_sessionize",
      (s, d) => Analytics.sessionizeNumeric(eventsUs(s, d),
          col("user_id"), col("ts_us"), 1800L * 1000000L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        m AS (SELECT user_id, ts_us,
          CASE WHEN lag(ts_us) OVER w IS NULL
            OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        t AS (SELECT user_id, ts_us,
          CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM m)
        SELECT user_id, session_id, count(*) AS n_events FROM t
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("events_window",
      // hourly buckets × event types over the data's fixed time span —
      // bounded output, single-partition sort (see orderBySmall)
      (s, d) => eventsUs(s, d)
        .groupBy(expr("ts_us div 3600000000").as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 18, 2).as("total_value"))
        .orderBySmall(col("bucket"), col("event_type")),
      Some(s"""SELECT epoch_us(ts) // 3600000000 AS bucket, event_type,
        count(*) AS n, ${dsumSql("value", 18, 2)} AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_fuzzy_join",
      // entity resolution: edit-distance join of customer vs supplier name
      // suffixes with prefix blocking (equi-join on the first 7 chars —
      // never a cross join), codegen'd levenshtein verify
      (s, d) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey"), substring(col("c_name"), 10, 9).as("ckey"))
        val su = t(s, d, "supplier")
          .select(col("s_suppkey"), substring(col("s_name"), 10, 9).as("skey"))
        Joins.fuzzyJoin(c, su, col("ckey"), col("skey"), maxDist = 1, blockLen = 7)
          .select(col("c_custkey"), col("s_suppkey"),
            col("edit_dist").cast("int").as("edit_dist"))
          .orderBy(col("c_custkey"), col("s_suppkey"))
      },
      Some("""WITH c AS (SELECT c_custkey, substring(c_name, 10, 9) AS ckey FROM customer),
        s AS (SELECT s_suppkey, substring(s_name, 10, 9) AS skey FROM supplier)
        SELECT c_custkey, s_suppkey, CAST(levenshtein(ckey, skey) AS INTEGER) AS edit_dist
        FROM c JOIN s ON substring(ckey, 1, 7) = substring(skey, 1, 7)
        WHERE abs(len(ckey) - len(skey)) <= 1 AND levenshtein(ckey, skey) <= 1
        ORDER BY c_custkey, s_suppkey""")),

    QueryDef("op_funnel",
      // ordered conversion funnel signup→click→purchase per user: stage k
      // counts only if its FIRST occurrence is strictly after stage k-1's.
      // One conditional aggregation — single shuffle, no per-stage joins
      (s, d) => Analytics.funnelStages(eventsUs(s, d), col("user_id"),
          col("event_type"), col("ts_us"), Seq("signup", "click", "purchase"))
        .withColumnRenamed("entity", "user_id")
        .orderBy(col("user_id")),
      Some("""WITH f AS (SELECT user_id,
          min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t0,
          min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1,
          min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t2
        FROM events GROUP BY 1)
        SELECT user_id, t0, t1, t2,
          CASE WHEN t0 IS NULL THEN 0
               WHEN t1 IS NULL OR t0 >= t1 THEN 1
               WHEN t2 IS NULL OR t1 >= t2 THEN 2
               ELSE 3 END AS reached
        FROM f ORDER BY user_id""")),

    QueryDef("op_event_deltas",
      // lead/lag surface: per-user inter-event gaps in µs (lag over one
      // shuffle on the user key) — the latency/recency building block
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        eventsUs(s, d)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events ORDER BY user_id, ts_us, event_id""")),

    QueryDef("op_scd2",
      // slowly-changing-dimension type-2 build: each per-user event is an
      // attribute-change record; valid_to = lead(ts) closes the interval,
      // NULL marks the current version (the warehouse dimension-versioning
      // primitive behind every point-in-time join). One window shuffle on
      // the natural key; output is the per-attribute interval audit with
      // exact integer-µs active durations.
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        eventsUs(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
          .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
            sum(when(col("valid_to").isNotNull, col("valid_to") - col("ts_us"))).as("active_us"))
          .orderBySmall(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_us(ts) AS ts_us,
          lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to
        FROM events)
        SELECT event_type, count(*) AS n_intervals,
          CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
          CAST(sum(CASE WHEN valid_to IS NOT NULL THEN valid_to - ts_us END) AS BIGINT) AS active_us
        FROM d GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_scd2_lookup",
      // point-in-time lookup against the SCD2 dimension (op_scd2's
      // intervals): for each user, "what was the attribute at time T?"
      // with T = the integer-µs midpoint of the user's activity — the
      // as-of semantics every warehouse fact⋈dimension join needs for
      // non-current history. The probe joins the dimension on the USER
      // key (equi-join; the interval predicate is a residual filter, so
      // the join is never a cartesian and shuffles on the natural key
      // both sides already share). Exactly one interval matches per user
      // — [valid_from, valid_to) partitions the timeline — so n_users
      // sums to the user count, pinned by construction
      (s, d) => {
        val ev = eventsUs(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val dim = ev.withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        val probes = ev.groupBy(col("user_id"))
          .agg(expr("(min(ts_us) + max(ts_us)) div 2").as("t_probe"))
        probes.join(dim, Seq("user_id"))
          .where(col("ts_us") <= col("t_probe") &&
            (col("valid_to").isNull || col("t_probe") < col("valid_to")))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
          .orderBySmall(col("event_type"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        dim AS (SELECT user_id, event_type, ts_us,
            lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to FROM ev),
        pr AS (SELECT user_id, (min(ts_us) + max(ts_us)) // 2 AS t_probe FROM ev GROUP BY 1)
        SELECT d.event_type, count(*) AS n_users
        FROM pr JOIN dim d ON d.user_id = pr.user_id
          AND d.ts_us <= pr.t_probe AND (d.valid_to IS NULL OR pr.t_probe < d.valid_to)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_time_travel",
      // time travel + CDC through the driver gate: base commits as v0,
      // a COW merge commits v1, then the query reads BOTH pinned
      // snapshots (snapshotAt — later commits can't change what v0
      // reads) plus the version diff, as one long-format audit. The
      // oracle derives every stage relationally: v0 = base, v1 = the
      // MERGE result, cdc_insert = exactly the update rows (keys are
      // unique and every update changes the row), cdc_delete = the
      // replaced old rows — the commit protocol, manifest pinning, and
      // EXCEPT ALL diff must all be invisible in the data. Same
      // tmp-root + stale-sweep pattern as op_merge_acid.
      (s, d) => {
        val tmpDir = System.getProperty("java.io.tmpdir")
        val prefix = "graft_tt_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getName != rp.getName)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true))
        fs.delete(rp, true)
        val base = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        // brand-new keys are NEGATIVE (-k-1, the planted-pair convention):
        // an additive offset would collide with real orderkeys once the SF
        // grows past the offset (TPC-H keys are 1..6M·SF), silently
        // breaking the analytic cdc_delete count below
        val updates = base.where(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(base.where(col("o_orderkey") % 1000 === 1)
            .select((-col("o_orderkey") - 1).as("o_orderkey"),
              lit(1.0).as("o_totalprice")))
        val mt = ManifestTable(s, root)
        val v0 = mt.overwrite(base)
        val v1 = mt.merge(updates, Seq("o_orderkey"))
        def stageAgg(df: DataFrame, stage: Column) = df.agg(
          count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 20, 2).as("sum_price"))
          .select(stage.as("stage"), col("n_rows"), col("sum_price"))
        stageAgg(mt.snapshotAt(v0), lit("v0"))
          .unionByName(stageAgg(mt.snapshotAt(v1), lit("v1")))
          .unionByName(mt.diff(v0, v1).groupBy(col("_change"))
            .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 20, 2).as("sum_price"))
            .select(concat(lit("cdc_"), col("_change")).as("stage"),
              col("n_rows"), col("sum_price")))
          .orderBySmall(col("stage"))
      },
      Some(s"""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT -o_orderkey - 1, 1.0 FROM base WHERE o_orderkey % 1000 = 1),
        v1 AS (SELECT b.o_orderkey, b.o_totalprice FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
          UNION ALL SELECT o_orderkey, o_totalprice FROM upd)
        SELECT 'v0' AS stage, count(*) AS n_rows, ${dsumSql("o_totalprice", 20, 2)} AS sum_price FROM base
        UNION ALL
        SELECT 'v1', count(*), ${dsumSql("o_totalprice", 20, 2)} FROM v1
        UNION ALL
        SELECT 'cdc_insert', count(*), ${dsumSql("o_totalprice", 20, 2)} FROM upd
        UNION ALL
        SELECT 'cdc_delete', count(*), ${dsumSql("o_totalprice", 20, 2)} FROM base WHERE o_orderkey % 10 = 0
        ORDER BY stage""")),

    QueryDef("op_group_split",
      // GROUP-INTEGRITY train/val/test split: the split key is the GROUP
      // (source domain), not the document — every doc of a domain lands
      // in ONE split, the leakage guard for near-duplicate-heavy groups
      // (the C4/url-host practice; a doc-keyed split lets near-dups of
      // one domain straddle train and eval). Same pure-projection
      // assignSplit as op_train_split, keyed on source. Output pins the
      // per-split doc/source counts AND the zero-violation check (no
      // source spans two splits) in the same row.
      (s, d) => {
        val docs = t(s, d, "documents").withColumn("split",
          Sampling.assignSplit(col("source"), Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        val per = docs.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("source")).as("n_sources"))
        val viol = docs.groupBy(col("source"))
          .agg(countDistinct(col("split")).as("ns"))
          .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("n_violations"))
        per.crossJoin(broadcast(viol)).orderBySmall(col("split"))
      },
      Some("""WITH a AS (SELECT source, CASE
          WHEN ('0x' || substring(md5(source), 1, 8))::BIGINT % 100 < 80 THEN 'train'
          WHEN ('0x' || substring(md5(source), 1, 8))::BIGINT % 100 < 90 THEN 'val'
          ELSE 'test' END AS split FROM documents),
        v AS (SELECT CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM (SELECT source, count(DISTINCT split) AS ns FROM a GROUP BY 1))
        SELECT split, count(*) AS n_docs, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          v.n_violations
        FROM a, v GROUP BY split, v.n_violations ORDER BY split""")),

    QueryDef("op_view_maintenance",
      // incremental materialized-view maintenance: a per-group
      // (count, decimal-sum) rollup of the ACID table is refreshed from
      // the v0→v1 CDC DIFF alone (Aggregates.maintainSumCount — cost
      // O(changes), never a base rescan), and the oracle is the FULL
      // recompute over v1: the delta-maintained aggregate must equal the
      // from-scratch one bit for bit, which is the entire contract of
      // view maintenance. Groups are pmod(o_orderkey, 7) so the negative
      // planted keys land in well-defined buckets both engines agree on.
      (s, d) => {
        val tmpDir = System.getProperty("java.io.tmpdir")
        val prefix = "graft_mv_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getName != rp.getName)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true))
        fs.delete(rp, true)
        val base = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        val updates = base.where(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("o_totalprice"))
          .unionByName(base.where(col("o_orderkey") % 1000 === 1)
            .select((-col("o_orderkey") - 1).as("o_orderkey"),
              lit(1.0).as("o_totalprice")))
        val mt = ManifestTable(s, root)
        val v0 = mt.overwrite(base)
        val v1 = mt.merge(updates, Seq("o_orderkey"))
        val dec = (c: Column) => c.cast("decimal(20,2)")
        val oldAgg = mt.snapshotAt(v0)
          .groupBy(pmod(col("o_orderkey"), lit(7L)).as("g"))
          .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("sum_val"))
        val cdc = mt.diff(v0, v1).withColumn("g", pmod(col("o_orderkey"), lit(7L)))
        Aggregates.maintainSumCount(oldAgg, cdc, Seq("g"), dec(col("o_totalprice")))
          .select(col("g"), col("cnt"), col("sum_val").cast("double").as("sum_price"))
          .orderBySmall(col("g"))
      },
      Some(s"""WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
        upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT -o_orderkey - 1, 1.0 FROM base WHERE o_orderkey % 1000 = 1),
        v1 AS (SELECT b.o_orderkey, b.o_totalprice FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
          UNION ALL SELECT o_orderkey, o_totalprice FROM upd)
        SELECT ((o_orderkey % 7) + 7) % 7 AS g, count(*) AS cnt,
          ${dsumSql("o_totalprice", 20, 2)} AS sum_price
        FROM v1 GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_cooccurrence",
      // market-basket co-occurrence with Jaccard affinity: distinct
      // (user, item) pairs self-joined on the user key → support per item
      // pair (a < b), plus per-item user counts and the exact-integer-fed
      // Jaccard = support / (n_a + n_b − support). The item vocabulary is
      // bounded, so the pair table is |items|²-bounded at ANY corpus size,
      // the per-item count side broadcasts, and the self-join is an
      // equi-join on user — never a cartesian (the same argument as the
      // LSH band joins, specialized to a categorical vocabulary).
      (s, d) => {
        val ui = eventsUs(s, d).select(col("user_id"), col("event_type")).distinct()
        val a = ui.select(col("user_id"), col("event_type").as("item_a"))
        val b = ui.select(col("user_id"), col("event_type").as("item_b"))
        val pairs = a.join(b, Seq("user_id")).where(col("item_a") < col("item_b"))
          .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("support"))
        val n = ui.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        pairs
          .join(broadcast(n.select(col("event_type").as("item_a"), col("n").as("n_a"))), "item_a")
          .join(broadcast(n.select(col("event_type").as("item_b"), col("n").as("n_b"))), "item_b")
          .select(col("item_a"), col("item_b"), col("support"), col("n_a"), col("n_b"),
            (col("support").cast("double") /
              (col("n_a") + col("n_b") - col("support")).cast("double")).as("jaccard"))
          .orderBySmall(col("item_a"), col("item_b"))
      },
      Some("""WITH ui AS (SELECT DISTINCT user_id, event_type FROM events),
        p AS (SELECT a.event_type AS item_a, b.event_type AS item_b, count(*) AS support
          FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2),
        n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ui GROUP BY 1)
        SELECT item_a, item_b, support, na.n AS n_a, nb.n AS n_b,
          CAST(support AS DOUBLE) / CAST(na.n + nb.n - support AS DOUBLE) AS jaccard
        FROM p JOIN n na ON p.item_a = na.event_type JOIN n nb ON p.item_b = nb.event_type
        ORDER BY item_a, item_b""")),

    QueryDef("op_triangles",
      // distributed triangle count + clustering coefficient
      // (Analytics.triangleStats: degree-ordered orientation, two joins)
      // on the circulant graph C_N(1,2) derived from the customer keys
      // (edges c→c+1, c→c+2 mod N) — deterministic, SF-growing, known
      // shape (~one triangle per vertex). The oracle enumerates with the
      // simpler id-ascending orientation: the COUNT is invariant to the
      // orientation order (every triangle has exactly one ascending
      // labeling under ANY total order), which is itself part of what the
      // hash compare checks.
      (s, d) => {
        val base = t(s, d, "customer").select(col("c_custkey").as("c"))
        val mx = base.agg(max(col("c")).as("mx"))
        def ring(step: Int) = base.crossJoin(broadcast(mx))
          .select(col("c").as("src"), pmod(col("c") + step, col("mx") + 1).as("dst"))
        Analytics.triangleStats(ring(1).unionByName(ring(2)), "src", "dst")
      },
      Some("""WITH mx AS (SELECT max(c_custkey) AS m FROM customer),
        er0 AS (SELECT c_custkey AS u, (c_custkey + 1) % (m + 1) AS v FROM customer, mx
          UNION ALL SELECT c_custkey, (c_custkey + 2) % (m + 1) FROM customer, mx),
        e0 AS (SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v FROM er0 WHERE u <> v),
        deg AS (SELECT x, count(*) AS d
          FROM (SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0) GROUP BY 1),
        tri AS (SELECT count(*) AS t FROM e0 x JOIN e0 y ON x.v = y.u
          JOIN e0 z ON z.u = x.u AND z.v = y.v),
        w AS (SELECT CAST(count(*) AS BIGINT) AS nv, CAST(sum(d) // 2 AS BIGINT) AS ne,
            CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg)
        SELECT w.nv AS n_vertices, w.ne AS n_edges, w.w AS n_wedges,
          CAST(tri.t AS BIGINT) AS n_triangles,
          CASE WHEN w.w > 0 THEN CAST(3 * tri.t AS DOUBLE) / CAST(w.w AS DOUBLE)
            ELSE 0.0 END AS clustering
        FROM w, tri""")),

    QueryDef("op_ntile",
      // decile bucketing of order values per priority class — ntile is the
      // per-group quantile-assignment surface (one window shuffle)
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            ntile(10).over(w).as("decile"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        CAST(ntile(10) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
        FROM orders ORDER BY o_orderkey""")),

    QueryDef("op_skew_profile",
      // pre-join skew diagnostic: per-key count distribution reduced to
      // the straggler predictors (max/avg ratio, exact heaviest key)
      (s, d) => Analytics.skewProfile(t(s, d, "lineitem"), col("l_orderkey")),
      Some("""WITH c AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
        s AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows, max(n) AS max_key_rows FROM c)
        SELECT s.n_keys, s.n_rows, s.max_key_rows, min(c.k) AS heaviest_key,
          CAST(s.max_key_rows AS DOUBLE) / (CAST(s.n_rows AS DOUBLE) / CAST(s.n_keys AS DOUBLE)) AS skew_factor
        FROM c, s WHERE c.n = s.max_key_rows
        GROUP BY 1, 2, 3""")),

    QueryDef("op_winsorize",
      // robust-stats outlier clamp: per-returnflag [p05, p95] percentile
      // band (exact linear interpolation), then decimal-exact sums of the
      // raw vs winsorized measure
      (s, d) => Analytics.winsorize(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_extendedprice"), pLo = 0.05, pHi = 0.95)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice"), 20, 2).as("sum_raw"),
          dsum(col("_wins"), 24, 6).as("sum_winsorized"))
        .orderBySmall(col("l_returnflag")),
      Some(s"""WITH b AS (SELECT l_returnflag AS g,
          quantile_cont(l_extendedprice, 0.05) AS lo,
          quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY 1)
        SELECT l_returnflag, count(*) AS n_rows,
          ${dsumSql("l_extendedprice", 20, 2)} AS sum_raw,
          ${dsumSql("least(greatest(l_extendedprice, lo), hi)", 24, 6)} AS sum_winsorized
        FROM lineitem JOIN b ON l_returnflag = b.g
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_cohort",
      // weekly cohort retention: users bucketed by first-event week, every
      // event counts its user into (cohort week, weeks since) — two aggs
      // and one entity-key join, the standard retention-matrix shape
      (s, d) => Analytics.cohortRetention(eventsUs(s, d), col("user_id"), col("ts_us"),
          periodLen = 7L * 86400L * 1000000L)
        .orderBySmall(col("cohort"), col("periods_since")),
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        f AS (SELECT user_id, CAST(floor(min(ts_us) / 604800000000) AS BIGINT) AS cohort
          FROM ev GROUP BY 1)
        SELECT f.cohort,
          CAST(floor(ev.ts_us / 604800000000) AS BIGINT) - f.cohort AS periods_since,
          count(DISTINCT ev.user_id) AS n_entities
        FROM ev JOIN f ON ev.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_zorder",
      // Z-order (Morton) clustering key over the customer grid points —
      // the write-time layout primitive for 2-D range pruning; the bit
      // interleave is a pure shift/mask chain mirrored exactly in SQL
      (s, d) => {
        val pts = custPoints(s, d)
        pts.select(col("c_custkey"),
            Layout.scaleToGrid(col("lat"), -60.0, 60.0, bits = 8).as("gx"),
            Layout.scaleToGrid(col("lon"), -150.0, 150.0, bits = 8).as("gy"))
          .select(col("c_custkey"), col("gx"), col("gy"),
            Layout.zValue(col("gx"), col("gy"), bits = 8).as("zval"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH p AS ($custPointsSql),
        g AS (SELECT c_custkey,
          CAST(floor((lat - -60.0) / 120.0 * 255.0) AS BIGINT) AS gx,
          CAST(floor((lon - -150.0) / 300.0 * 255.0) AS BIGINT) AS gy
        FROM p)
        SELECT c_custkey, gx, gy, ${Layout.zValueSql("gx", "gy", bits = 8)} AS zval
        FROM g ORDER BY c_custkey""")),

    QueryDef("op_zorder_pruned",
      // the READ half of the Z-order story (op_zorder computes the key;
      // this key proves the LAYOUT pays): write the customer grid
      // clustered by Morton z-value — repartitionByRange on z puts
      // disjoint z-ranges in separate files, sorted within — then read
      // back with a 2-D box predicate; both dimension filters push to
      // the parquet scan (PushedFilters pinned in PlanSpec) where file/
      // row-group min-max stats skip non-overlapping z-runs. The oracle
      // replays the box over the source table, so clustering must be
      // value-preserving
      (s, d) => {
        val dir = scratchDir("zord", d)
        val pts = custPoints(s, d).select(col("c_custkey"),
          Layout.scaleToGrid(col("lat"), -60.0, 60.0, bits = 8).as("gx"),
          Layout.scaleToGrid(col("lon"), -150.0, 150.0, bits = 8).as("gy"))
        Layout.writeZOrdered(pts, dir, col("gx"), col("gy"), bits = 8, numFiles = 8)
        s.read.parquet(dir)
          .where(col("gx").between(64, 127) && col("gy").between(32, 95))
          .agg(count(lit(1)).as("n_inside"),
            sum(col("c_custkey")).as("sum_key"),
            min(col("gx")).as("min_gx"), max(col("gy")).as("max_gy"))
          .orderBySmall(col("n_inside"))
      },
      Some(s"""WITH p AS ($custPointsSql),
          g AS (SELECT c_custkey,
            CAST(floor((lat - -60.0) / 120.0 * 255.0) AS BIGINT) AS gx,
            CAST(floor((lon - -150.0) / 300.0 * 255.0) AS BIGINT) AS gy
          FROM p)
        SELECT count(*) AS n_inside, CAST(sum(c_custkey) AS BIGINT) AS sum_key,
          min(gx) AS min_gx, max(gy) AS max_gy
        FROM g WHERE gx BETWEEN 64 AND 127 AND gy BETWEEN 32 AND 95
        ORDER BY n_inside""")),

    QueryDef("op_bucketed_join",
      // bucketed co-located join: BOTH sides land bucketed+sorted on the
      // join key (Layout.writeBucketed), so the join itself plans NO
      // shuffle exchange — the write-once / join-many amortization that is
      // the top lever for repeated 100-TB fact⋈fact joins. The oracle
      // checks the JOIN RESULT against the original parquet; the
      // exchange-free plan shape is pinned in PlanSpec (a result check
      // can't see the shuffle). Bucket files live under the JVM tmpdir,
      // keyed by SF dir AND pid (two concurrent harness processes on the
      // same SF must not overwrite each other's in-flight bucket files);
      // dead pids' roots are swept after the same 1h age guard as
      // op_merge_acid/op_time_travel.
      (s, d) => {
        val tmpDir = sys.props("java.io.tmpdir")
        val prefix = "graft_bucketed_" + new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getPath != root)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f.getPath)
            p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
          }
        Layout.writeBucketed(
          t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
          "graft_b_orders", s"$root/orders", numBuckets = 8, keys = Seq("o_custkey"))
        Layout.writeBucketed(
          t(s, d, "customer").select("c_custkey", "c_mktsegment"),
          "graft_b_customer", s"$root/customer", numBuckets = 8, keys = Seq("c_custkey"))
        s.table("graft_b_orders")
          .join(s.table("graft_b_customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 20, 2).as("sum_price"))
          .orderBySmall(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
          ${dsumSql("o_totalprice", 20, 2)} AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_regression",
      // distributed OLS + correlation from EXACT moments: every sum is a
      // decimal (order-independent partial aggregation), and the slope/
      // intercept/corr formulas are evaluated as the same IEEE double
      // expression tree in both engines (+,-,*,/,sqrt are exactly rounded,
      // so identical operands + identical shape = identical bits). The
      // built-in corr()/regr_slope() are float-accumulation order-dependent
      // and would hash-flake — this is the deterministic form.
      // Cast scales are chosen so NO decimal cast ever rounds near a
      // boundary: quantity is integer-valued, price has exactly 2dp, so
      // x·y has 2dp, x² is integer — and each product's double ulp
      // (≤2e-6 at y²~1e10) is far below the half-step of its cast
      // scale. A uniform decimal(30,6) here actually FAILED: y²'s ulp sits
      // AT the 6dp quantum, so HALF_UP (Spark) vs HALF_EVEN (DuckDB)
      // diverged on boundary rows.
      // (decimal widths differ from the SQL mirror's — both are exact for
      // this data, and exact sums cast to double identically)
      // yyScale capped to 0dp (round-9 hardening): Σprice² per group is
      // ~19 significant digits at 4dp — outside the 2⁵³ window where the
      // engines' decimal→double conversions agree bitwise. Passing today
      // at 4dp was data-luck; the quantized 0dp moment is portable by
      // construction and survives a testdata regeneration.
      (s, d) => Analytics.regressionByGroup(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          xScale = 0, yScale = 2, yyScale = 0)
        .withColumnRenamed("grp", "l_returnflag")
        .orderBySmall(col("l_returnflag")),
      Some("""WITH m AS (SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(10,0))) AS DOUBLE) AS sxx,
          CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,0))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY 1),
        r AS (SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
          (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr,
          sx, sy, n FROM m)
        SELECT l_returnflag, n_rows, slope,
          (sy - slope * sx) / n AS intercept, corr
        FROM r ORDER BY 1""")),

    QueryDef("op_corr_matrix",
      // one-pass pairwise correlation matrix (exact decimal moments,
      // shared IEEE formula — the op_regression technique generalized to
      // k columns / one aggregation). Scales: quantity integer, price 2dp,
      // discount/tax 2dp. price² is capped to 0dp: its exact 4dp sum needs
      // 19 significant digits, past the 2⁵³ window where the two engines'
      // decimal→double conversions agree bitwise (measured 1-ulp split at
      // sf0.1); the 0dp quantized moment converts exactly in both.
      (s, d) => Analytics.correlationMatrix(t(s, d, "lineitem"),
          Seq("l_quantity" -> 0, "l_extendedprice" -> 2, "l_discount" -> 2, "l_tax" -> 2),
          productScaleOverride = Map(("l_extendedprice", "l_extendedprice") -> 0))
        .orderBySmall(col("col_a"), col("col_b")),
      Some {
        val cols = Seq("l_quantity" -> 0, "l_extendedprice" -> 2, "l_discount" -> 2, "l_tax" -> 2)
        val cap = Map((1, 1) -> 0)
        val singles = cols.indices.map { i =>
          s"CAST(sum(CAST(${cols(i)._1} AS DECIMAL(24,${cols(i)._2}))) AS DOUBLE) AS s$i" }
        val prods = for { i <- cols.indices; j <- cols.indices if i <= j } yield
          s"CAST(sum(CAST(${cols(i)._1} * ${cols(j)._1} AS DECIMAL(30,${cap.getOrElse((i, j), cols(i)._2 + cols(j)._2)}))) AS DOUBLE) AS p${i}_$j"
        val pairRows = (for { i <- cols.indices; j <- cols.indices if i < j } yield
          s"""SELECT '${cols(i)._1}' AS col_a, '${cols(j)._1}' AS col_b,
            (n * p${i}_$j - s$i * s$j) /
              sqrt((n * p${i}_$i - s$i * s$i) * (n * p${j}_$j - s$j * s$j)) AS corr
          FROM m""").mkString(" UNION ALL ")
        s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
            ${(singles ++ prods).mkString(", ")}
          FROM lineitem)
          $pairRows ORDER BY 1, 2"""
      }),

    QueryDef("op_gapfill",
      // time-series densification: per event type, every hourly bucket
      // between that type's first and last event exists in the output with
      // a zero count where no events landed — sequence+explode generates
      // the grid distributively (no driver-side range materialization)
      (s, d) => {
        val counts = eventsUs(s, d)
          .groupBy(col("event_type"), expr("ts_us div 3600000000").as("bucket"))
          .agg(count(lit(1)).as("n"))
        val spans = counts.groupBy(col("event_type"))
          .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
        val grid = spans.select(col("event_type"),
          explode(sequence(col("b0"), col("b1"))).as("bucket"))
        // grid cardinality = types × hourly buckets of the data's FIXED
        // time span — bounded at any SF, so the single-partition sort
        // applies (the heavy per-event aggregation sits below the join)
        grid.join(counts, Seq("event_type", "bucket"), "left")
          .select(col("event_type"), col("bucket"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBySmall(col("event_type"), col("bucket"))
      },
      Some("""WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS bucket, count(*) AS n
          FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM c GROUP BY 1),
        g AS (SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM s)
        SELECT g.event_type, g.bucket, coalesce(c.n, 0) AS n
        FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.bucket = c.bucket
        ORDER BY 1, 2""")),

    // ---- text analysis (north star) ----
    QueryDef("txt_word_counts",
      (s, d) => t(s, d, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20),
      Some("""SELECT tok, count(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS tok
        FROM documents) GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 20""")),

    QueryDef("txt_language_guess",
      (s, d) => TextAnalysis.languageGuessed(t(s, d, "documents"), "text")
        .groupBy(col("guess"), col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBySmall(col("guess"), col("lang")),
      Some {
        def hits(words: Seq[String]) =
          s"len(list_filter(toks, x -> x IN (${words.map("'" + _ + "'").mkString(", ")})))"
        val Seq(en, de, fr, es) = Seq("en", "de", "fr", "es").map(l => hits(TextAnalysis.stopwords(l)))
        s"""SELECT guess, lang, count(*) AS cnt FROM (
          SELECT CASE
            WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en > 0 THEN 'en'
            WHEN $de >= $fr AND $de >= $es AND $de > 0 THEN 'de'
            WHEN $fr >= $es AND $fr > 0 THEN 'fr'
            WHEN $es > 0 THEN 'es'
            ELSE 'unknown' END AS guess, lang
          FROM (SELECT list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks, lang
            FROM documents))
          GROUP BY 1, 2 ORDER BY 1, 2"""
      }),

    QueryDef("txt_quality",
      // one definition: the library's qualityScored IS the query (the oracle
      // mirrors its zero-token/zero-char guards)
      (s, d) => TextAnalysis.qualityScored(t(s, d, "documents"), col("text"))
        .select("doc_id", "n_tokens", "punct_ratio", "avg_token_len", "stopword_ratio")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        CASE WHEN len(text) > 0 THEN
          CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
          ELSE 0.0 END AS punct_ratio,
        CASE WHEN len(toks) > 0 THEN CAST(len(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
          ELSE 0.0 END AS avg_token_len,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
          ELSE 0.0 END AS stopword_ratio
        FROM (SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents) ORDER BY doc_id""")),

    QueryDef("txt_bpe_token_count",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS INTEGER) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+')) AS INTEGER) AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),

    QueryDef("txt_bpe_trained",
      // REAL trained BPE (Sennrich merges: corpus word-count aggregation,
      // driver-side greedy merges, distributed encode), hash-checked on a
      // corpus whose merge SEQUENCE is analytically forced. Doc i holds
      // words 0..doc_id%150, where word_j is the unique 2-char string
      // lower(j/26)+upper(j%26): each word carries exactly ONE symbol pair,
      // pairs never overlap across words, and a merged word (2 chars → 1
      // token) creates no new pairs — so pair frequency f_j = #{docs with
      // doc_id%150 >= j} is the whole statistic. f_j is non-increasing in
      // j, and on ties the trainer's (count desc, pair lex asc) rule picks
      // the lower j (pair lex order == j order by construction) — the 100
      // learned merges are words 0..99 in order, at ANY doc_id
      // distribution. Encoding is then exact: word j costs 1 token if
      // j <= 99, else 2. The TRAINER ran for real; only its forced
      // outcome is mirrored in SQL. Natural-corpus trainer/encoder
      // contracts stay property-tested in TextPipelineSpec.
      (s, d) => {
        val words: Seq[String] = (0 until 150).map(j =>
          s"${('a' + j / 26).toChar}${('A' + j % 26).toChar}")
        val docs2 = t(s, d, "documents").select(col("doc_id"),
          array_join(slice(typedlit(words), lit(1),
            pmod(col("doc_id"), lit(150L)).cast("int") + 1), " ").as("text"))
        val merges = Bpe.train(docs2, "text", numMerges = 100)
        docs2.select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
            Bpe.tokenCount(merges)(col("text")).as("n_bpe_tokens"),
            length(col("text")).as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          CAST(doc_id % 150 + 1 AS INTEGER) AS n_ws_tokens,
          CAST(doc_id % 150 + 1 +
            CASE WHEN doc_id % 150 > 99 THEN doc_id % 150 - 99 ELSE 0 END
            AS INTEGER) AS n_bpe_tokens,
          CAST(3 * (doc_id % 150 + 1) - 1 AS INTEGER) AS n_chars
        FROM documents ORDER BY doc_id""")),

    QueryDef("txt_fingerprint_dedup",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
        .orderBy(col("fp")),
      Some("""SELECT fp, min(doc_id) AS keeper, count(*) AS n_docs FROM (
        SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fp
        FROM documents) GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_winnow_fingerprints",
      // winnowing selects ~2/(w+1) of gram hashes as local fingerprints;
      // output is summarized per doc (count + extrema) to keep the compare
      // payload small while still pinning every selected hash
      (s, d) => TextAnalysis.winnowFingerprints(t(s, d, "documents"), "doc_id", "text")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"), min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"),
          md5(concat_ws(",", sort_array(collect_list(col("fp"))))).as("fp_digest"))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (SELECT doc_id,
          [substring(md5(substring(text, i, 8)), 1, 8) FOR i IN generate_series(1, len(text) - 7)] AS hashes
        FROM documents WHERE len(text) >= 11),
      f AS (SELECT doc_id,
          list_distinct([list_aggregate(hashes[j:j+3], 'min') FOR j IN generate_series(1, len(hashes) - 3)]) AS fps
        FROM g),
      e AS (SELECT doc_id, unnest(fps) AS fp FROM f)
      SELECT doc_id, count(*) AS n_fps, min(fp) AS min_fp, max(fp) AS max_fp,
        md5(string_agg(fp, ',' ORDER BY fp)) AS fp_digest
      FROM e GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_winnow_fast",
      // the xxhash64 production form of winnowing (same kernel the
      // fingerprint-dedup pipelines use). Hash-checked via a planted
      // construct: doc i's text is a run of one repeated character
      // (class = doc_id%26, length 11+doc_id%13 >= k+w-1), so every 8-char
      // gram inside a doc is IDENTICAL — whatever its xxhash64 value, each
      // window's min is that single hash and the distinct fingerprint set
      // has exactly ONE element. Docs of the same class share that gram
      // (hence that fingerprint) regardless of length; the 26 gram strings
      // are FIXED (independent of the corpus), and their 26 hashes are
      // verified pairwise-distinct once, so the fp-join partner count per
      // doc is exactly its class size − 1 — analytic without evaluating
      // xxhash64. This checks the hash equality STRUCTURE across docs (the
      // property winnow dedup consumes), not just per-doc counts; md5-form
      // equivalence on natural text stays a DedupSpec property.
      (s, d) => {
        val docs2 = t(s, d, "documents").select(col("doc_id"),
          expr("repeat(char(97 + doc_id % 26), CAST(11 + doc_id % 13 AS INT))").as("text"))
        val fps = TextAnalysis.winnowFingerprintsFast(docs2, "doc_id", "text")
        val perDoc = fps.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_fps"), max(col("fp")).as("_fp"))
        val classSize = fps.groupBy(col("fp").as("_fp"))
          .agg(count(lit(1)).as("_cls"))
        perDoc.join(classSize, Seq("_fp"))
          .select(col("doc_id"), col("n_fps"), (col("_cls") - 1).as("n_partners"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH cls AS (SELECT doc_id % 26 AS c, count(*) AS n
          FROM documents GROUP BY 1)
        SELECT d.doc_id, CAST(1 AS BIGINT) AS n_fps,
          CAST(cls.n - 1 AS BIGINT) AS n_partners
        FROM documents d JOIN cls ON d.doc_id % 26 = cls.c
        ORDER BY d.doc_id""")),

    QueryDef("txt_chunk",
      // token-window chunking with overlap (training-example splitter):
      // 32-token chunks, stride 24; chunk text pinned by md5 digest
      (s, d) => TextAnalysis.chunkByTokens(t(s, d, "documents"), "doc_id", "text",
          chunkTokens = 32, stride = 24)
        .select(col("doc_id"), col("chunk_no"), col("n_chunk_tokens"),
          md5(col("chunk_text")).as("chunk_digest"))
        .orderBy(col("doc_id"), col("chunk_no")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        st AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks), 24)) AS start_i
          FROM tk WHERE len(toks) >= 1)
        SELECT doc_id, CAST((start_i - 1) // 24 AS INTEGER) AS chunk_no,
          CAST(len(toks[start_i : start_i + 31]) AS INTEGER) AS n_chunk_tokens,
          md5(array_to_string(toks[start_i : start_i + 31], ' ')) AS chunk_digest
        FROM st ORDER BY doc_id, chunk_no""")),

    QueryDef("txt_pii_scrub",
      // PII redaction (emails/URLs/phones, RE2-class patterns): the corpus
      // has no natural PII, so deterministic PII is injected per doc
      // (op05-style construct-and-check), then counted and scrubbed
      (s, d) => {
        val withPii = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" see https://ex.com/"), col("doc_id")).as("text"))
        val (emails, urls, phones) = TextAnalysis.piiCounts(col("text"))
        withPii.select(col("doc_id"), emails.as("n_emails"), urls.as("n_urls"),
            phones.as("n_phones"),
            md5(TextAnalysis.scrubPii(col("text"))).as("scrubbed_digest"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t2 AS (SELECT doc_id,
          text || ' contact user' || doc_id || '@example.com or +1-555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' see https://ex.com/' || doc_id AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
          CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS INTEGER) AS n_urls,
          CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\-\s]{6,}[0-9]')) AS INTEGER) AS n_phones,
          md5(regexp_replace(regexp_replace(regexp_replace(text,
            'https?://[^\s]+', '<URL>', 'g'),
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\+?[0-9][0-9()\-\s]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_digest
        FROM t2 ORDER BY doc_id""")),

    QueryDef("txt_repetition",
      // Gopher-style repetition quality signals over 2-gram occurrences
      // (duplicates kept, unlike dedup shingles)
      (s, d) => TextAnalysis.repetitionSignals(t(s, d, "documents"), "doc_id", "text", n = 2)
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS gram
          FROM tk WHERE len(toks) >= 2),
        c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams, count(*) AS n_distinct,
          CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_frac,
          CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_frac
        FROM c GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_contamination",
      // eval-benchmark decontamination: per-doc fraction of distinct
      // 3-gram shingles appearing anywhere in the benchmark subset
      // (every 37th doc stands in for the eval set)
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.contaminationScores(docs, docs.where(col("doc_id") % 37 === 0),
            "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        bn AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
        FROM sh LEFT JOIN bn ON sh.shingle = bn.shingle
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_contamination_bloom",
      // the beyond-broadcast decontamination path, HASH-CHECKED: the
      // driver-built Bloom filter is a map-side PREFILTER whose false
      // positives are killed by an exact verify join over the flagged
      // sliver only, so the output EQUALS the exact contamination scores —
      // the sketch accelerates the plan but no longer appears in the
      // answer, and the oracle is the same SQL as txt_contamination. The
      // raw one-sided upper-bound form (contaminationFlagsBloom) remains
      // ScalaTest-proven (no-false-negative containment in TextPipelineSpec).
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.contaminationScoresBloomVerified(docs, docs.where(col("doc_id") % 37 === 0),
            "doc_id", "text", shingleN = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        bn AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0)
        SELECT sh.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
          CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination
        FROM sh LEFT JOIN bn ON sh.shingle = bn.shingle
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("pipeline_curation_v2",
      // the COMPLETE curation pipeline as one declarative chain:
      // repetition filter → benchmark decontamination → MinHash-LSH cluster
      // dedup (keep one representative per component) → chunking. Output is
      // the per-stage retention funnel; every stage's definition is the
      // same one its standalone query uses, so the whole chain is
      // oracle-checkable end to end (recursive-CTE CC included).
      (s, d) => {
        val docs = t(s, d, "documents")
        // tokenize ONCE: every stage (repetition grams, contamination
        // shingles, MinHash shingles, chunking) reads the same cached token
        // arrays instead of re-scanning parquet + re-splitting text — at
        // 100 TB this materialized column is the difference between one
        // tokenizer pass and five
        val toksDF = docs
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rep = TextAnalysis.repetitionSignalsFromTokens(toksDF, "doc_id", "_toks", n = 2)
          .where(col("dup_frac") < 0.4).select("doc_id")
        val corpusSh = Dedup.shingleTableFromTokens(toksDF, "doc_id", "_toks", 3)
        val benchSh = Dedup.shingleTableFromTokens(
          toksDF.where(col("doc_id") % 37 === 0), "doc_id", "_toks", 3)
        val cont = Dedup.contaminationScoresFromShingles(corpusSh, benchSh, "doc_id")
          .where(col("contamination") < 0.5).select("doc_id")
        // rep/cont stay UNHINTED deliberately: the joined side is a narrow
        // doc-id filter and the probe side carries the fat token arrays —
        // a merge hint here forces two full shuffles+sorts of the token
        // table (measured 2x the query's wall time) to save one broadcast
        // build job. At real scale AQE (ON per SCALE.md) right-sizes this
        // per run; the id filters only outgrow a broadcast when the corpus
        // does, and then the exchange is the linear, unavoidable one.
        val surviving = toksDF.join(rep, "doc_id").join(cont, "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val survSh = Dedup.shingleTableFromTokens(surviving, "doc_id", "_toks", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = Dedup.minhashNearDupPairsFromShingles(survSh, "doc_id",
          numHashes = 8, rowsPerBand = 2, threshold = 0.1)
        val dropped = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
          .where(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id"), lit(1).as("_drop"))
        // the funnel is ONE aggregation over flag columns: quality/kept are
        // left-join flags and the per-doc chunk count is a pure expression
        // (size of the stride-start sequence — identical to counting the
        // exploded chunk rows, without materializing them). The round-4
        // form crossJoined four independent single-row aggregates, which
        // cost a broadcast job each; this is 3 left joins + 1 agg.
        surviving.select(col("doc_id"), lit(1).as("_q"), col("_toks"))
          .join(dropped, Seq("doc_id"), "left")
          .select(col("_q"), (col("_q") === 1 && col("_drop").isNull).as("_kept"),
            when(col("_drop").isNull && size(col("_toks")) >= 1,
              size(sequence(lit(1), size(col("_toks")), lit(24)))).otherwise(lit(0)).as("_nch"))
          // coalesce: sum over ZERO rows is NULL where the oracle's
          // count(*) over an empty funnel stage is 0
          .agg(coalesce(sum(col("_q")).cast("long"), lit(0L)).as("_nq"),
            coalesce(sum(when(col("_kept"), 1L).otherwise(0L)), lit(0L)).as("n_dedup"),
            coalesce(sum(col("_nch")).cast("long"), lit(0L)).as("n_chunks"))
          .crossJoin(docs.agg(count(lit(1)).as("n_total")))
          .select(col("n_total"), col("_nq").as("n_quality"), col("n_dedup"), col("n_chunks"))
      },
      Some(s"""WITH RECURSIVE
        tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS gram
          FROM tk WHERE len(toks) >= 2),
        gc AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        rep AS (SELECT doc_id FROM gc GROUP BY doc_id
          HAVING CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) < 0.4),
        shl0 AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh0 AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl0),
        bn AS (SELECT DISTINCT shingle FROM sh0 WHERE doc_id % 37 = 0),
        cont AS (SELECT sh0.doc_id FROM sh0 LEFT JOIN bn ON sh0.shingle = bn.shingle
          GROUP BY 1
          HAVING CAST(sum(CASE WHEN bn.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) < 0.5),
        surv AS (SELECT d.doc_id, d.text FROM documents d
          JOIN rep ON d.doc_id = rep.doc_id JOIN cont ON d.doc_id = cont.doc_id),
        mp AS (${minhashOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1, from = "surv")}),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mp UNION SELECT doc_b, doc_a FROM mp),
        vs AS (SELECT DISTINCT src AS v FROM e),
        reach AS (
          SELECT v, v AS r FROM vs
          UNION
          SELECT e.src AS v, reach.r FROM e JOIN reach ON reach.v = e.dst),
        lab AS (SELECT v AS doc_id, min(r) AS rep FROM reach GROUP BY v),
        dropped AS (SELECT doc_id FROM lab WHERE doc_id <> rep),
        keep AS (SELECT surv.doc_id FROM surv LEFT JOIN dropped ON surv.doc_id = dropped.doc_id
          WHERE dropped.doc_id IS NULL),
        ch AS (SELECT k.doc_id, unnest(generate_series(1, len(tk.toks), 24)) AS start_i
          FROM keep k JOIN tk ON tk.doc_id = k.doc_id WHERE len(tk.toks) >= 1)
        SELECT (SELECT count(*) FROM documents) AS n_total,
          (SELECT count(*) FROM surv) AS n_quality,
          (SELECT count(*) FROM keep) AS n_dedup,
          (SELECT count(*) FROM ch) AS n_chunks""")),

    QueryDef("txt_tfidf_topk",
      // per-doc top-3 terms by a TF-IDF-monotone integer ranking
      // (tf desc, df asc, token asc) — float idf scores would hash-flake on
      // libm last-ulp differences; the integer keys order identically
      (s, d) => TextAnalysis.topTermsByTfidf(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        idf AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        r AS (SELECT tf.doc_id, tf.token, tf.tf, idf.df,
            row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, idf.df ASC, tf.token ASC) AS rank
          FROM tf JOIN idf USING (token))
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df
        FROM r WHERE rank <= 3 ORDER BY doc_id, rank""")),

    QueryDef("dedup_minhash_fast",
      // xxhash64 MinHash-LSH (production form; the md5 form above oracles
      // the natural corpus). Hash-checked via plantedTokenDocs: cross-doc
      // Jaccard is exactly 0 (disjoint shingle sets), planted copies are
      // exactly 1, so at any threshold in (0,1] the output is precisely
      // the planted pair per doc with >= shingleN tokens — no probabilistic
      // element at all (false candidates from 64-bit bucket collisions are
      // killed by the exact verify at jac=0). md5-pipeline equivalence on
      // natural near-dups remains a DedupSpec property.
      (s, d) => Dedup.minhashNearDupPairsFast(plantedTokenDocs(s, d), "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""SELECT CAST(-doc_id - 1 AS BIGINT) AS doc_a, doc_id AS doc_b,
          CAST(1.0 AS DOUBLE) AS jac
        FROM documents
        WHERE len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) >= 3
        ORDER BY 1, 2""")),

    QueryDef("dedup_simhash_fast",
      // 64-bit xxhash64 simhash with 4x16-bit pigeonhole chunks — the
      // production form without the md5/60-bit oracle ceiling. Hash-checked
      // via plantedTokenDocs: planted copies hash identically (hamming 0);
      // distinct docs share no tokens, so their 64-bit simhashes are
      // independent and the nearest non-planted pair sits ~32 bits apart —
      // P(any pair <= 3) ~ 1e-7 at sf0.1, and on the driver's FIXED corpus
      // recall/precision is a determinism frozen by this very hash compare
      // (the emb_near_dup argument). banded==brute remains a DedupSpec
      // property on natural text.
      (s, d) => Dedup.simhashNearDupPairsFast(plantedTokenDocs(s, d), "doc_id", "text",
          maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""SELECT CAST(-doc_id - 1 AS BIGINT) AS doc_a, doc_id AS doc_b,
          CAST(0 AS INTEGER) AS hamming
        FROM documents
        WHERE len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) >= 1
        ORDER BY 1, 2""")),

    QueryDef("dedup_clusters",
      // near-dup pairs → connected components → cluster representative per
      // doc (the actual keep/drop decision). Spark: min-label propagation
      // with pointer jumping; oracle: recursive CTE reachability — both
      // compute "min id reachable", which is iteration-order independent
      (s, d) => Dedup.dedupClusters(
          Dedup.minhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
            shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1),
          "doc_a", "doc_b")
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE mp AS (${minhashOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)}),
        e AS (SELECT doc_a AS src, doc_b AS dst FROM mp UNION SELECT doc_b, doc_a FROM mp),
        vs AS (SELECT DISTINCT src AS v FROM e),
        reach AS (
          SELECT v, v AS r FROM vs
          UNION
          SELECT e.src AS v, reach.r FROM e JOIN reach ON reach.v = e.dst)
        SELECT v AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY v ORDER BY doc_id""")),

    QueryDef("op_collect_ordered",
      // deterministic ordered collect (the string_agg/array_agg reporting
      // surface): collect_list alone is partition-order-dependent;
      // array_sort makes it exact. The group domain is pre-filtered small
      // BY DESIGN: an ordered collect buffers its whole group, which is the
      // string_agg semantic — bounded "first k per group" extraction
      // belongs to the TopK aggregator (see ann_cosine_topk), not to a
      // collect that is then sliced
      (s, d) => eventsUs(s, d)
        .where(col("event_id") % 199 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("event_id"))), ",").as("ids_csv"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
          array_to_string(list_sort(list(event_id)), ',') AS ids_csv
        FROM events WHERE event_id % 199 = 0 GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_sample_stratified",
      // deterministic hash-stratified sampling (reproducible corpus mixes):
      // keep-decision is md5(key) mod 100 < rate(stratum) — a pure filter,
      // identical in any engine, stable under repartitioning
      (s, d) => Sampling.stratifiedSampleByHash(t(s, d, "lineitem"),
          col("l_returnflag"), concat_ws("-", col("l_orderkey"), col("l_linenumber")),
          Map("A" -> 10, "N" -> 2, "R" -> 50))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"), dsum(col("l_quantity"), 20, 2).as("sum_qty"))
        .orderBySmall(col("l_returnflag")),
      Some(s"""SELECT l_returnflag, count(*) AS n_kept, ${dsumSql("l_quantity", 20, 2)} AS sum_qty
        FROM lineitem
        WHERE ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100
          < CASE l_returnflag WHEN 'A' THEN 10 WHEN 'N' THEN 2 WHEN 'R' THEN 50 ELSE 0 END
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("mix_sources",
      // token-budget corpus mixture: per-source keep rates derived from
      // mixture weights and the measured per-source token mass, then a
      // deterministic hash-unit filter — the whole mix decision is
      // engine-portable (exact md5 bits / 2^60, IEEE-identical rate math)
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        Sampling.mixByTokenBudget(docs, col("doc_id"), col("source"), col("n_tok"),
            Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
            tokenBudget = 3000L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        tot AS (SELECT source AS msrc, sum(n_tok) AS st FROM tk GROUP BY 1),
        r AS (SELECT msrc, least(CAST(1.0 AS DOUBLE),
            CAST(3000 AS DOUBLE) * (CASE msrc WHEN 'src0' THEN CAST(0.4 AS DOUBLE)
              WHEN 'src1' THEN CAST(0.3 AS DOUBLE) WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
              WHEN 'src3' THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
            / CAST(st AS DOUBLE)) AS rate FROM tot)
        SELECT tk.doc_id, tk.source, tk.n_tok FROM tk JOIN r ON tk.source = r.msrc
        WHERE CAST(('0x' || substring(md5(CAST(tk.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
          / 4503599627370496.0 < r.rate
        ORDER BY tk.doc_id""")),

    QueryDef("mix_temperature",
      // temperature-flattened mixture at the engine-portable α = 1/2 point
      // (sqrt is exactly rounded; general pow is libm): share ∝ sqrt(mass),
      // capped keep rates, deterministic hash-unit filter. Output is the
      // per-source funnel (bounded: one row per source at any SF). The
      // normalization sum's ADDITION ORDER is pinned on both sides (sorted
      // driver fold / ORDER BY'd list_sum) — double + is order-dependent
      // in the last ulp and a rate boundary must not wobble between
      // engines. The oracle's HAVING st > 0 mirrors the operator's
      // zero-mass-source drop (sqrt(0)/0 would otherwise be IEEE NaN,
      // which DuckDB's least() treats as greatest → rate 1.0, keeping
      // docs Spark drops).
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        Sampling.mixByTemperature(docs, col("doc_id"), col("source"), col("n_tok"),
            alpha = 0.5, tokenBudget = 3000L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBySmall(col("source"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        tot AS (SELECT source AS msrc, sum(n_tok) AS st FROM tk GROUP BY 1
          HAVING sum(n_tok) > 0),
        z AS (SELECT list_sum(list(sqrt(CAST(st AS DOUBLE)) ORDER BY msrc)) AS zz FROM tot),
        r AS (SELECT msrc, least(CAST(1.0 AS DOUBLE),
            CAST(3000 AS DOUBLE) * (sqrt(CAST(st AS DOUBLE)) / z.zz) / CAST(st AS DOUBLE)) AS rate
          FROM tot CROSS JOIN z)
        SELECT tk.source, count(*) AS n_docs, CAST(sum(tk.n_tok) AS BIGINT) AS n_tokens
        FROM tk JOIN r ON tk.source = r.msrc
        WHERE CAST(('0x' || substring(md5(CAST(tk.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
          / 4503599627370496.0 < r.rate
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("ml_perceptron_quality",
      // trainable quality-classifier stage: integer-feature batch
      // perceptron fit (3 rounds, one exact long-sum agg each) + literal-
      // expression predict, reported as the confusion matrix (bounded: at
      // most 4 cells at any SF). Labels are a planted separable rule, so
      // the hash check pins the ENTIRE iterative fit — every weight update
      // is integer arithmetic both engines agree on exactly.
      (s, d) => {
        val f = t(s, d, "documents").select(col("doc_id"),
          (col("doc_id") % 7).cast("long").as("f1"),
          (col("doc_id") % 11).cast("long").as("f2"),
          when(lit(2) * (col("doc_id") % 7) - (col("doc_id") % 11) + 1 > 0, 1)
            .otherwise(-1).as("y"))
        val w = Analytics.perceptronFit(f, Seq(col("f1"), col("f2")), col("y"), iters = 3)
        f.select(col("y").as("label"),
            Analytics.perceptronPredict(Seq(col("f1"), col("f2")), w).as("pred"))
          .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
          .orderBySmall(col("label"), col("pred"))
      },
      Some(perceptronOracleSql(iters = 3))),

    QueryDef("txt_pack_sequences",
      // GPT-style concat-then-split sequence packing, sharded by source:
      // per-doc starting offset, pack id, and in-pack offset — exact
      // integer window math, hash-checkable end to end
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
        TextAnalysis.packSequences(docs, col("source"), Seq(col("doc_id")), col("n_tok"), seqLen = 256)
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
            CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tok
          FROM documents),
        w AS (SELECT doc_id, source, n_tok,
            CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
          FROM tk)
        SELECT doc_id, source, n_tok, start_off,
          CAST(floor(start_off / 256) AS BIGINT) AS pack_id,
          start_off % 256 AS pack_off
        FROM w ORDER BY source, doc_id""")),

    QueryDef("txt_length_bucketing",
      // padding accountant for batch assembly: sequences bucket to the
      // smallest holding cap (32/64/128/256; longer = truncation at the
      // max cap), per-bucket pad-token counts cap·n − Σlen, plus the
      // one-bucket baseline row (bucket_cap = -1: everything padded to
      // 256) — the saving that justifies length bucketing, all exact
      // integers from one linear pass + two bounded aggs
      (s, d) => {
        val caps = Seq(32, 64, 128, 256)
        val toks = t(s, d, "documents")
          .select(TextAnalysis.tokenCount(col("text")).as("n_tok"))
        val buckets = TextAnalysis.lengthBucketPadding(toks, col("n_tok"), caps)
        val single = toks.agg(count(lit(1)).as("n_seqs"),
            sum(least(col("n_tok"), lit(256)).cast("long")).as("sum_len"))
          .select(lit(-1).as("bucket_cap"), col("n_seqs"), col("sum_len"),
            (lit(256L) * col("n_seqs") - col("sum_len")).as("padded"))
        buckets.unionByName(single).orderBySmall(col("bucket_cap"))
      },
      Some("""WITH tk AS (SELECT CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS INTEGER) AS n_tok
          FROM documents),
        e AS (SELECT CASE WHEN n_tok <= 32 THEN 32 WHEN n_tok <= 64 THEN 64
            WHEN n_tok <= 128 THEN 128 ELSE 256 END AS bucket_cap,
          least(n_tok, 256) AS eff FROM tk)
        SELECT bucket_cap, count(*) AS n_seqs, CAST(sum(eff) AS BIGINT) AS sum_len,
          CAST(bucket_cap * count(*) - sum(eff) AS BIGINT) AS padded
        FROM e GROUP BY 1
        UNION ALL
        SELECT -1, count(*), CAST(sum(eff) AS BIGINT), CAST(256 * count(*) - sum(eff) AS BIGINT)
        FROM e
        ORDER BY bucket_cap""")),

    QueryDef("txt_inverted_index",
      // inverted-index head (the IR-serving shape behind retrieval and
      // TF-IDF): top-20 tokens by document frequency with df, collection
      // frequency, and the first-10 posting prefix. Head-token posting
      // lists are corpus-sized, so the prefix comes from a windowed
      // rank ≤ 10 over (token, doc) pairs — bounded per-group state —
      // never a full-list collect
      (s, d) => TextAnalysis.invertedIndexHead(
          t(s, d, "documents"), "doc_id", "text", k = 20, postingN = 10)
        .orderBySmall(col("df").desc, col("token")),
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        td AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        top AS (SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
          FROM td GROUP BY 1 ORDER BY df DESC, token LIMIT 20),
        po AS (SELECT td.token, td.doc_id,
            row_number() OVER (PARTITION BY td.token ORDER BY td.doc_id) AS rn
          FROM td JOIN top ON td.token = top.token),
        pl AS (SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
          FROM po WHERE rn <= 10 GROUP BY 1)
        SELECT t.token, t.df, t.cf, pl.postings
        FROM top t JOIN pl ON t.token = pl.token ORDER BY t.df DESC, t.token""")),

    QueryDef("web_domain_counts",
      // registered-domain reach (C4/RefinedWeb-style head-domain ranking).
      // The corpus text has no URLs, so the op05 construct-and-parse trick
      // applies: every doc cites a subdomain of its source's .org plus a
      // mixed-case mirror on .net — exercising extraction, lowercasing,
      // and the eTLD+1 rollup against the same regex in both engines
      (s, d) => Web.domainDocCounts(urlDocs(s, d), "doc_id", "text2")
        .orderBy(col("domain")),
      Some(s"""WITH $urlDocsSql
        SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM rd GROUP BY domain ORDER BY domain""")),

    QueryDef("web_blocklist_filter",
      // domain-blocklist curation: a doc with ANY blocked-domain mention
      // drops (subdomain mentions roll up to the registered domain).
      // Output is the per-source survivor count — src3/src15 vanish via
      // their .org domains, src7 via its .net mirror
      (s, d) => {
        import s.implicits._
        val blocklist = Seq("src3.org", "src7.net", "src15.org").toDF("domain")
        Web.domainBlocklistFilter(urlDocs(s, d), "doc_id", "text2", blocklist)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $urlDocsSql,
        hit AS (SELECT DISTINCT doc_id FROM rd
          WHERE domain IN ('src3.org', 'src7.net', 'src15.org'))
        SELECT d.source, count(*) AS n_kept
        FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        WHERE hit.doc_id IS NULL GROUP BY d.source ORDER BY d.source""")),

    QueryDef("web_url_dedup",
      // canonical-URL dedup (the crawl-frontier key): four planted
      // spellings per doc — mixed-case host + default port + utm params +
      // trailing slash + fragment vs the clean form, and a root URL whose
      // `:80` / all-utm-query variants must also collapse — exercise every
      // canonicalization rule; the oracle replays the identical regexp
      // chain (see Web.canonicalizeUrl for the mirroring constraints)
      (s, d) => {
        val sevens = pmod(col("doc_id"), lit(7L)).cast("string")
        val threes = pmod(col("doc_id"), lit(3L)).cast("string")
        val urls = t(s, d, "documents").select(col("doc_id"), explode(array(
          concat(lit("https://Sub"), sevens, lit("."), col("source"),
            lit(".ORG:443/Path/"), col("doc_id").cast("string"),
            lit("/?utm_source=feed&ref="), threes, lit("#frag")),
          concat(lit("https://sub"), sevens, lit("."), col("source"),
            lit(".org/Path/"), col("doc_id").cast("string"), lit("?ref="), threes),
          concat(lit("http://"), col("source"), lit(".net:80/")),
          concat(lit("HTTP://"), col("source"), lit(".NET/?utm_campaign=x")))).as("url"))
        Web.urlDedup(urls, "doc_id", "url").orderBy(col("canonical_url"))
      },
      Some(s"""WITH u AS (SELECT doc_id, unnest([
          'https://Sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.ORG:443/Path/' ||
            CAST(doc_id AS VARCHAR) || '/?utm_source=feed&ref=' || CAST(doc_id % 3 AS VARCHAR) || '#frag',
          'https://sub' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.org/Path/' ||
            CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 3 AS VARCHAR),
          'http://' || source || '.net:80/',
          'HTTP://' || source || '.NET/?utm_campaign=x']) AS url
        FROM documents),
        ${canonicalCteSql("u")}
        SELECT canonical_url, count(*) AS n_mentions,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc
        FROM canon GROUP BY 1 ORDER BY 1""")),

    QueryDef("web_html_extract",
      // HTML → visible text (the crawl-to-corpus step): constructed markup
      // wraps every document (htmlDocs — head/style/script/comment
      // boilerplate, an entity-bearing paragraph, one anchor), and
      // Web.stripHtml must recover exactly "A & B: <text> more <id>" —
      // boilerplate CONTENT gone, anchor text kept, &amp; single-decoded.
      // Per-source recovery audit: n_recovered == n_docs is the pinned
      // invariant, sum_chars pins the exact extracted bytes. Linear
      // regex chain in codegen; the only shuffle is the final bounded agg
      (s, d) => {
        val expected = concat(lit("A & B: "), col("text"),
          lit(" more "), col("doc_id").cast("string"))
        htmlDocs(s, d)
          .withColumn("extracted", Web.stripHtml(col("html")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("extracted") === expected, 1L).otherwise(0L)).as("n_recovered"),
            sum(length(col("extracted")).cast("long")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some(s"""WITH $htmlDocsSql,
        ${stripHtmlCteSql("hd", "html")}
        SELECT source, count(*) AS n_docs,
          CAST(sum(CASE WHEN extracted = 'A & B: ' || text || ' more ' || CAST(doc_id AS VARCHAR)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered,
          CAST(sum(len(extracted)) AS BIGINT) AS sum_chars
        FROM ext GROUP BY 1 ORDER BY 1""")),

    QueryDef("web_link_graph",
      // hyperlink graph + anchor-text corpus from markup: every page
      // carries a self link (its source's .org domain) and a messy
      // cross link (mixed case, www, default port, utm params) to a hub
      // domain in the same namespace — so each srcK.org aggregates BOTH
      // clean self links and canonicalization-normalized hub links.
      // htmlLinks explodes anchors once; the canonical chain and eTLD+1
      // rollup are linear projections; the per-domain agg is bounded by
      // the domain vocabulary. Anchor chars pin the anchor-text side
      (s, d) => {
        val pages = t(s, d, "documents").withColumn("html", concat(
          lit("<p>intro</p><a href=\"https://"), col("source"),
          lit(".org/d/"), col("doc_id").cast("string"),
          lit("\">self link "), col("doc_id").cast("string"),
          lit("</a><div><A HREF=\"HTTP://www.src"), pmod(col("doc_id"), lit(5L)).cast("string"),
          lit(".ORG:80/hub/?utm_source=crawl\">Hub  page</A></div>")))
        val links = Web.htmlLinks(pages, "doc_id", "html")
        val canon = links
          .withColumn("curl", Web.canonicalizeUrl(col("href")))
          .withColumn("domain", Web.registeredDomain(
            regexp_extract(col("curl"), "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)))
        canon.groupBy(col("domain"))
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("min_doc"),
            sum(length(col("anchor")).cast("long")).as("anchor_chars"))
          .orderBySmall(col("domain"))
      },
      Some(s"""WITH pg AS (SELECT doc_id, source,
          '<p>intro</p><a href="https://' || source || '.org/d/' || CAST(doc_id AS VARCHAR) ||
          '">self link ' || CAST(doc_id AS VARCHAR) ||
          '</a><div><A HREF="HTTP://www.src' || CAST(doc_id % 5 AS VARCHAR) ||
          '.ORG:80/hub/?utm_source=crawl">Hub  page</A></div>' AS html
        FROM documents),
        el AS (SELECT doc_id,
          unnest(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>', 0)) AS elem,
          generate_subscripts(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>', 0), 1) - 1 AS pos
        FROM pg),
        lk AS (SELECT doc_id, doc_id * 1000 + pos AS link_id,
          regexp_extract(elem, '(?i)href="([^"]*)"', 1) AS url,
          trim(regexp_replace(regexp_extract(elem, '(?is)^<a\\s[^>]*>(.*)</a>$$', 1), '\\s+', ' ', 'g')) AS anchor
        FROM el),
        cu AS (SELECT link_id AS doc_id, url FROM lk),
        ${canonicalCteSql("cu")},
        dm0 AS (SELECT l.doc_id, l.anchor,
          regexp_extract(c.canonical_url, '^[a-z][a-z0-9+.-]*://([^/?#:]*)', 1) AS host
        FROM lk l JOIN canon c ON c.doc_id = l.link_id),
        dm AS (SELECT doc_id, anchor,
          CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) = '' THEN host
            ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS domain
        FROM dm0)
        SELECT domain, count(*) AS n_links,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, min(doc_id) AS min_doc,
          CAST(sum(len(anchor)) AS BIGINT) AS anchor_chars
        FROM dm GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_record_linkage",
      // blocked record linkage (entity resolution): a dirty copy of the
      // customer table is constructed with four deterministic corruption
      // classes (exact / '#'→'-' / 'Mr ' prefix / trailing char; every
      // 11th record is scrambled beyond repair), candidates come from an
      // EQUI-join on a corruption-stable blocking key (8 of the 9 name
      // digits → blocks of ≤10 at ANY scale factor — candidate volume
      // linear, never all-pairs), and block-mates verify by Levenshtein
      // ≤ 3 with best-match-per-record resolution (min dist, min id).
      // Output: per-distance match counts with the identity check
      // (n_correct == n_pairs pins that every match found the TRUE
      // entity) plus the dist=-1 unmatched row — exactly the scrambled
      // records, the recall/cost trade made visible
      (s, d) => {
        val cust = t(s, d, "customer")
        val clean = cust.select(col("c_custkey").as("id"), col("c_name").as("name"),
          substring(col("c_name"), 10, 8).as("block"))
        val dirty = cust.select(col("c_custkey").as("id"),
          when(pmod(col("c_custkey"), lit(11L)) === 0,
            concat(lit("zz"), reverse(col("c_name"))))
            .when(pmod(col("c_custkey"), lit(4L)) === 1,
              replace(col("c_name"), lit("#"), lit("-")))
            .when(pmod(col("c_custkey"), lit(4L)) === 2,
              concat(lit("Mr "), col("c_name")))
            .when(pmod(col("c_custkey"), lit(4L)) === 3,
              concat(col("c_name"), lit("x")))
            .otherwise(col("c_name")).as("name"))
          .withColumn("block",
            substring(regexp_extract(col("name"), "[0-9]{5,}", 0), 1, 8))
        val m = Linkage.bestMatch(clean, dirty, maxDist = 3)
        val matched = m.groupBy(col("dist"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("clean_id") === col("dirty_id"), 1L).otherwise(0L)).as("n_correct"))
        // the unmatched set is corpus-sized in the worst case — merge, not broadcast
        val un = dirty
          .join(m.select(col("dirty_id").as("id")).hint("merge"), Seq("id"), "left_anti")
          .agg(count(lit(1)).as("n_pairs"))
          .select(lit(-1).as("dist"), col("n_pairs"), lit(0L).as("n_correct"))
        matched.unionByName(un).orderBySmall(col("dist"))
      },
      Some("""WITH clean AS (SELECT c_custkey AS id, c_name AS name,
          substr(c_name, 10, 8) AS block FROM customer),
        dirty AS (SELECT id, name, substr(regexp_extract(name, '[0-9]{5,}'), 1, 8) AS block
          FROM (SELECT c_custkey AS id, CASE
            WHEN c_custkey % 11 = 0 THEN 'zz' || reverse(c_name)
            WHEN c_custkey % 4 = 1 THEN replace(c_name, '#', '-')
            WHEN c_custkey % 4 = 2 THEN 'Mr ' || c_name
            WHEN c_custkey % 4 = 3 THEN c_name || 'x'
            ELSE c_name END AS name FROM customer)),
        cand AS (SELECT d.id AS dirty_id, c.id AS clean_id,
            levenshtein(d.name, c.name) AS dist
          FROM dirty d JOIN clean c ON d.block = c.block
          WHERE levenshtein(d.name, c.name) <= 3),
        m AS (SELECT dirty_id, clean_id, dist FROM (SELECT dirty_id, clean_id, dist,
            row_number() OVER (PARTITION BY dirty_id ORDER BY dist, clean_id) AS rn
          FROM cand) WHERE rn = 1)
        SELECT CAST(dist AS INTEGER) AS dist, count(*) AS n_pairs,
          CAST(sum(CASE WHEN clean_id = dirty_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM m GROUP BY 1
        UNION ALL
        SELECT CAST(-1 AS INTEGER), count(*), CAST(0 AS BIGINT) FROM dirty d
          WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.dirty_id = d.id)
        ORDER BY dist""")),

    QueryDef("op_bfs",
      // multi-source BFS hop distance (graph family: CC, PageRank,
      // triangles, now shortest hops): the undirected customer–supplier
      // bipartite graph from orders⋈lineitem, seeded at every 100th
      // supplier. Level-synchronous frontier expansion (Analytics.bfsHops
      // — one equi-join per hop, anti-join against the settled set,
      // rounds ≤ min(diameter, 6)); the oracle replays it as a bounded-
      // depth recursive CTE with min-distance resolution. Output: node
      // counts per hop level plus the dist=-1 unreachable row
      (s, d) => {
        val e0 = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
          .distinct()
        val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = t(s, d, "supplier").where(col("s_suppkey") % 100 === 0)
          .select(concat(lit("s"), col("s_suppkey").cast("string")).as("node"))
        val dist = Analytics.bfsHops(e, seeds, maxHops = 6)
        val nodes = e.select(col("src").as("node")).distinct()
        val reached = dist.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
        val unreached = nodes
          .join(dist.select(col("node")).hint("merge"), Seq("node"), "left_anti")
          .agg(count(lit(1)).as("n_nodes"))
          .select(lit(-1).as("dist"), col("n_nodes"))
        reached.unionByName(unreached).orderBySmall(col("dist"))
      },
      Some("""WITH RECURSIVE e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
            's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        seeds AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey % 100 = 0),
        r AS (SELECT node, 0 AS d FROM seeds
          UNION
          SELECT e.dst AS node, r.d + 1 AS d FROM r JOIN e ON e.src = r.node WHERE r.d < 6),
        b AS (SELECT node, min(d) AS dist FROM r GROUP BY node),
        nodes AS (SELECT DISTINCT src AS node FROM e)
        SELECT CAST(dist AS INTEGER) AS dist, count(*) AS n_nodes FROM b GROUP BY 1
        UNION ALL
        SELECT CAST(-1 AS INTEGER), count(*) FROM nodes n
          WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.node = n.node)
        ORDER BY dist""")),

    QueryDef("txt_vocab_coverage",
      // tokenizer-vocab head curve: top-100 tokens with the cumulative
      // share of all token occurrences they cover; integer counts, one
      // exact double division at the end
      (s, d) => TextAnalysis.vocabCoverage(t(s, d, "documents"), "text", k = 100)
        .orderBySmall(col("rank")),
      Some("""WITH tok AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
        top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 100)
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank,
          token, CAST(cnt AS BIGINT) AS cnt,
          CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / t.total AS cum_frac
        FROM top, t ORDER BY rank""")),

    QueryDef("txt_oov_frac",
      // per-doc out-of-vocabulary fraction vs the corpus's own top-15
      // vocab — the "gibberish/wrong-tokenizer" quality signal; integer
      // counts, one exact double division
      (s, d) => TextAnalysis.oovFraction(t(s, d, "documents"), "doc_id", "text", vocabK = 15)
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        v AS (SELECT token FROM (SELECT token, count(*) AS cnt FROM tok GROUP BY 1
          ORDER BY cnt DESC, token LIMIT 15) q),
        j AS (SELECT tok.doc_id, v.token AS vt FROM tok LEFT JOIN v ON tok.token = v.token)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_frac
        FROM j GROUP BY doc_id ORDER BY doc_id""")),

    QueryDef("txt_bigram_lm",
      // bigram language-model corpus stats: how common are each doc's token
      // TRANSITIONS corpus-wide (boilerplate detector), plus novel-bigram
      // counts (memorization/uniqueness signal). Exact integer sums + one
      // final double division — the unigramFreqScore discipline one n up
      (s, d) => TextAnalysis.bigramLmScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t FROM documents),
        bg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t) - 1)]) AS bigram
          FROM tok WHERE len(t) >= 2),
        c AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1)
        SELECT doc_id, count(*) AS n_bigrams, CAST(sum(cnt) AS BIGINT) AS sum_bigram_cnt,
          CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel_bigrams,
          CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bigram_freq
        FROM bg JOIN c USING (bigram) GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_collocations",
      // collocation mining by lift (PMI sans the monotone log): exact
      // integer supports, deterministic float ranking key (identical
      // multiply/divide tree both sides), support cut + bounded top-200
      // head — phrase extraction for tokenizer/vocab curation
      (s, d) => TextAnalysis.collocationsByLift(t(s, d, "documents"), "text",
        minSupport = 10L, topK = 200),
      Some("""WITH tok AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t FROM documents),
          uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM tok) GROUP BY 1),
          n AS (SELECT sum(c) AS n FROM uc),
          bc AS (SELECT bigram, count(*) AS c_ab FROM (
              SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]) AS bigram
              FROM tok WHERE len(t) >= 2) GROUP BY 1),
          b AS (SELECT sum(c_ab) AS b FROM bc)
        SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab, CAST(ua.c AS BIGINT) AS c_a,
          CAST(ub.c AS BIGINT) AS c_b,
          CAST(c_ab AS DOUBLE) * CAST(n.n AS DOUBLE) * CAST(n.n AS DOUBLE) /
            (CAST(b.b AS DOUBLE) * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
        FROM bc JOIN uc ua ON string_split(bigram, ' ')[1] = ua.w
        JOIN uc ub ON string_split(bigram, ' ')[2] = ub.w
        CROSS JOIN n CROSS JOIN b
        WHERE c_ab >= 10
        ORDER BY lift DESC, bigram LIMIT 200""")),

    QueryDef("txt_c4_filters",
      // C4/Gopher rule battery over a constructed multi-line corpus (the
      // testdata is single-line, so line structure is planted: a 2-word
      // line always, a bullet line on doc_id%4, an ellipsis line on
      // doc_id%7, a closing line whose terminal '.' lands on doc_id%3 —
      // every branch of every rule fires at any SF). All counts integer,
      // flags integer-compared; one exact double division for the mean
      (s, d) => {
        val d2 = t(s, d, "documents").select(col("doc_id"), concat(
          col("text"),
          lit("\nShort line"),
          when(pmod(col("doc_id"), lit(4L)) === 0,
            concat(lit("\n- bullet item "), col("doc_id").cast("string"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7L)) === 0, lit("\nto be continued...")).otherwise(lit("")),
          concat(lit("\nThis is the closing line"),
            when(pmod(col("doc_id"), lit(3L)) === 0, lit(".")).otherwise(lit("")))).as("text2"))
        // fused single-scan kernel form; bit-identical to the c4Filters
        // expression spec (property-tested), ~6 interpreted regex passes
        // cheaper per document
        TextAnalysis.c4FiltersFast(d2, "doc_id", "text2").orderBy(col("doc_id"))
      },
      Some("""WITH d2 AS (SELECT doc_id,
          text || chr(10) || 'Short line' ||
          CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet item ' || CAST(doc_id AS VARCHAR) ELSE '' END ||
          CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'to be continued...' ELSE '' END ||
          chr(10) || 'This is the closing line' || CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END AS t
        FROM documents),
        m AS (SELECT doc_id, string_split(t, chr(10)) AS lines,
            list_filter(string_split_regex(t, '\s+'), x -> len(x) > 0) AS toks FROM d2),
        c AS (SELECT doc_id,
            CAST(len(lines) AS INTEGER) AS n_lines,
            CAST(len(toks) AS INTEGER) AS n_words,
            CAST(len(list_filter(lines, l -> regexp_matches(l, '[.!?"]$'))) AS INTEGER) AS n_end_punct_lines,
            CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•] '))) AS INTEGER) AS n_bullet_lines,
            CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS INTEGER) AS n_ellipsis_lines,
            CAST(len(list_filter(lines, l -> len(list_filter(string_split_regex(l, '\s+'), w -> len(w) > 0)) < 3)) AS INTEGER) AS n_short_lines,
            CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS INTEGER) AS n_alpha_words,
            CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS wc
          FROM m)
        SELECT doc_id, n_lines, n_words, n_end_punct_lines, n_bullet_lines, n_ellipsis_lines,
          n_short_lines, n_alpha_words,
          CASE WHEN n_words > 0 THEN CAST(wc AS DOUBLE) / CAST(n_words AS DOUBLE) ELSE 0.0 END AS mean_word_len,
          (n_words >= 50 AND wc >= n_words * 3 AND wc <= n_words * 10 AND n_bullet_lines * 10 <= n_lines * 9
            AND n_ellipsis_lines * 10 <= n_lines * 3 AND n_alpha_words * 10 >= n_words * 8) AS gopher_pass,
          (n_end_punct_lines * 2 >= n_lines) AS c4_terminal_punct_pass
        FROM c ORDER BY doc_id""")),

    QueryDef("op_json_flatten",
      // deep nested-JSON flatten (op14_json covers the FLAT roundtrip;
      // real feeds nest): construct a two-level document — a struct field
      // plus a variable-length array of structs — then from_json with the
      // full nested schema → dot-path projection + explode back to
      // relational rows. The item count varies per doc (doc_id%3+1) so
      // the explode cardinality is data-dependent, and every leaf value
      // derives from ids — exact in both engines (DuckDB replays via
      // json_extract paths over the identically-constructed string).
      (s, d) => {
        val n = pmod(col("doc_id"), lit(3L)).cast("int") + 1
        val itemsJson = concat_ws(",", transform(sequence(lit(0), n - 1),
          k => concat(lit("{\"k\":"), k.cast("string"), lit(",\"v\":"),
            pmod(col("doc_id") + k, lit(5L)).cast("string"), lit("}"))))
        val js = concat(lit("{\"user\":{\"id\":"), col("doc_id").cast("string"),
          lit(",\"lang\":\""), col("lang"), lit("\"},\"items\":["), itemsJson, lit("]}"))
        t(s, d, "documents").select(from_json(js,
            org.apache.spark.sql.types.StructType.fromDDL(
              "user struct<id: bigint, lang: string>, items array<struct<k: int, v: bigint>>"))
            .as("p"))
          .select(col("p.user.id").as("user_id"), col("p.user.lang").as("lang"),
            explode(col("p.items")).as("it"))
          .select(col("user_id"), col("lang"),
            col("it.k").as("item_k"), col("it.v").as("item_v"))
          .orderBy(col("user_id"), col("item_k"))
      },
      Some("""WITH j AS (SELECT doc_id,
          '{"user":{"id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang || '"},"items":[' ||
          array_to_string([('{"k":' || CAST(k AS VARCHAR) || ',"v":' || CAST((doc_id + k) % 5 AS VARCHAR) || '}')
            FOR k IN generate_series(0, doc_id % 3)], ',') || ']}' AS js
        FROM documents),
        e AS (SELECT js, unnest(generate_series(0,
            CAST(json_array_length(js, '$.items') AS INTEGER) - 1)) AS i FROM j)
        SELECT CAST(json_extract(js, '$.user.id') AS BIGINT) AS user_id,
          json_extract_string(js, '$.user.lang') AS lang,
          CAST(json_extract(js, '$.items[' || CAST(i AS VARCHAR) || '].k') AS INTEGER) AS item_k,
          CAST(json_extract(js, '$.items[' || CAST(i AS VARCHAR) || '].v') AS BIGINT) AS item_v
        FROM e ORDER BY user_id, item_k""")),

    QueryDef("pipeline_curation",
      // the canonical training-data funnel as ONE lazy plan:
      // quality score -> token floor -> language filter -> fingerprint dedup;
      // output is the per-stage retention funnel (single row)
      (s, d) => {
        // tokenize ONCE; both the token floor and the language hits read the
        // materialized token column
        val toked = t(s, d, "documents")
          .withColumn("_tk", TextAnalysis.tokens(col("text")))
        val scored = TextAnalysis.languageGuessed(toked, "text", toksCol = Some("_tk"))
          .withColumn("n_tokens", size(col("_tk")))
        val quality = col("n_tokens") >= 20
        val en = quality && col("guess") === "en"
        scored
          .withColumn("fp", when(en, TextAnalysis.fingerprint(col("text"))))
          .agg(count(lit(1)).as("n_total"),
            sum(when(quality, 1).otherwise(0)).cast("long").as("n_quality"),
            sum(when(en, 1).otherwise(0)).cast("long").as("n_en"),
            countDistinct(col("fp")).as("n_unique"))
      },
      Some {
        def hits(words: Seq[String]) =
          s"len(list_filter(toks, x -> x IN (${words.map("'" + _ + "'").mkString(", ")})))"
        val Seq(en, de, fr, es) = Seq("en", "de", "fr", "es").map(l => hits(TextAnalysis.stopwords(l)))
        s"""WITH tk AS (SELECT doc_id, text,
            list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM documents),
          g AS (SELECT doc_id, text, len(toks) AS n_tokens, CASE
            WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en > 0 THEN 'en'
            WHEN $de >= $fr AND $de >= $es AND $de > 0 THEN 'de'
            WHEN $fr >= $es AND $fr > 0 THEN 'fr'
            WHEN $es > 0 THEN 'es'
            ELSE 'unknown' END AS guess FROM tk),
          m AS (SELECT *, n_tokens >= 20 AS q, n_tokens >= 20 AND guess = 'en' AS e FROM g)
          SELECT count(*) AS n_total,
            CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
            CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
            CAST(count(DISTINCT CASE WHEN e THEN
              md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))
              END) AS BIGINT) AS n_unique
          FROM m"""
      }),

    QueryDef("dedup_exact",
      (s, d) => t(s, d, "documents")
        .agg(count(lit(1)).as("total"), countDistinct(col("text")).as("n_distinct")),
      Some("""SELECT count(*) AS total, CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
        FROM documents""")),

    QueryDef("dedup_minhash_jaccard",
      (s, d) => Dedup.minhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(minhashOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1))),

    QueryDef("dedup_simhash",
      (s, d) => Dedup.simhashNearDupPairs(t(s, d, "documents"), "doc_id", "text", maxHamming = 3)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("doc_a"), col("doc_b")),
      Some(simhashOracleSql(maxHamming = 3))),

    QueryDef("op_pagerank",
      // iterative graph centrality (the cluster-representative picker that
      // complements dedupClusters) on a deterministic 37-node multigraph
      // derived from orders; 4 unrolled iterations replayed exactly in the
      // oracle. The FIXED-POINT form is the oracled one: scaled-long
      // arithmetic is bit-identical across engines and partition orders,
      // where the float form's double→decimal contribution rounding
      // diverges in the last ulp between Spark (exact HALF_UP) and DuckDB
      // (cast via double multiply) — measured ~1e-17, enough to flip a
      // hash. Float/fixed agreement is pinned in DedupSpec instead.
      (s, d) => {
        val edges = t(s, d, "orders")
          .select((col("o_custkey") % 37).as("src"), (col("o_orderkey") % 37).as("dst"))
        Dedup.pageRankFixedPoint(edges, "src", "dst", iters = 4)
          .orderBySmall(col("v"))
      },
      Some(pageRankOracleSql(iters = 4, mod = 37))),

    QueryDef("op_hits",
      // HITS hubs & authorities on the op_pagerank 37-node multigraph —
      // the second classic link-analysis fixed point (hub = endorses
      // good authorities, authority = endorsed by good hubs), 3 unrolled
      // double-rounds replayed exactly in integer CTEs
      (s, d) => {
        val edges = t(s, d, "orders")
          .select((col("o_custkey") % 37).as("src"), (col("o_orderkey") % 37).as("dst"))
        Analytics.hitsFixedPoint(edges, "src", "dst", iters = 3)
          .orderBySmall(col("v"))
      },
      Some(hitsOracleSql(iters = 3, mod = 37))),

    QueryDef("op_k_anonymity",
      // k-anonymity / l-diversity audit (the release gate that pairs
      // with op_acid_delete's GDPR path): QI = (nation, segment,
      // balance band), sensitive = a derived category; census of
      // group-size bands + groups failing 2-diversity
      (s, d) => Analytics.kAnonymityAudit(
          t(s, d, "customer").select(col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / 2000).cast("long").as("bal_band"),
            (col("c_custkey") % 7).as("sensitive")),
          Seq(col("c_nationkey"), col("c_mktsegment"), col("bal_band")),
          col("sensitive"), lMin = 2)
        .orderBySmall(col("band")),
      Some("""WITH qi AS (SELECT c_nationkey, c_mktsegment,
            CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
            c_custkey % 7 AS sensitive
          FROM customer),
        g AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz,
            count(DISTINCT sensitive) AS ldiv FROM qi GROUP BY 1, 2, 3)
        SELECT CASE WHEN sz = 1 THEN '1' WHEN sz < 5 THEN '2-4'
            WHEN sz < 10 THEN '5-9' ELSE '10+' END AS band,
          count(*) AS n_groups, CAST(sum(sz) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN sz >= 2 AND ldiv < 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_low_diversity
        FROM g GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_label_propagation",
      // deterministic synchronous LPA communities on the op_pagerank
      // 37-node multigraph (argmax votes, smallest-label ties — no
      // randomized visit order), 3 unrolled rounds replayed in CTEs
      (s, d) => {
        val edges = t(s, d, "orders")
          .select((col("o_custkey") % 37).as("src"), (col("o_orderkey") % 37).as("dst"))
        Analytics.labelPropagation(edges, "src", "dst", rounds = 3)
          .orderBySmall(col("v"))
      },
      Some(lpaOracleSql(rounds = 3, mod = 37))),

    QueryDef("op_anonymize",
      // k-suppression applied (the op_k_anonymity audit's enforcement
      // half): rows in QI groups smaller than 5 are suppressed; the
      // result pins the invariant directly — every surviving group ≥ 5
      // (min_kept_group_size is IN the output)
      (s, d) => {
        val base = t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
        val sup = Analytics.kSuppress(base,
          Seq(col("c_nationkey"), col("c_mktsegment"), col("bal_band")), k = 5)
        val keptGroups = sup.where(!col("_suppress"))
          .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
          .agg(count(lit(1)).as("_sz"))
          .agg(count(lit(1)).as("n_kept_groups"), min(col("_sz")).as("min_kept_group_size"))
        sup.agg(count(lit(1)).as("n_total"),
            sum(when(col("_suppress"), 1L).otherwise(0L)).as("n_suppressed"))
          .crossJoin(broadcast(keptGroups))
          .orderBySmall(col("n_total"))
      },
      Some("""WITH qi AS (SELECT c_custkey, c_nationkey, c_mktsegment,
            CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band FROM customer),
          g AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz
            FROM qi GROUP BY 1, 2, 3),
          tagged AS (SELECT qi.*, g.sz < 5 AS suppress FROM qi
            JOIN g USING (c_nationkey, c_mktsegment, bal_band)),
          kept AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS sz
            FROM tagged WHERE NOT suppress GROUP BY 1, 2, 3),
          kg AS (SELECT count(*) AS n_kept_groups,
            CAST(min(sz) AS BIGINT) AS min_kept_group_size FROM kept)
        SELECT count(*) AS n_total,
          CAST(sum(CASE WHEN suppress THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
          (SELECT n_kept_groups FROM kg) AS n_kept_groups,
          (SELECT min_kept_group_size FROM kg) AS min_kept_group_size
        FROM tagged ORDER BY n_total""")),

    QueryDef("dedup_ngram_jaccard",
      // EXACT n-gram Jaccard near-dup: df-capped inverted-index candidate
      // generation (shingles in > maxDf docs never generate candidates —
      // the cap is mirrored in the oracle, so results match exactly), then
      // exact Jaccard over the FULL shingle sets. The deterministic
      // complement to the probabilistic MinHash family: any shared shingle
      // with df <= maxDf guarantees the pair is found.
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          shingleN = 3, threshold = 0.5, maxDf = 10)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        kept AS (SELECT doc_id, shingle FROM (
          SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
          WHERE df <= 10),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) AS jac
        FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) >= 0.5
        ORDER BY doc_a, doc_b""")),

    QueryDef("dedup_containment",
      // EXACT n-gram CONTAINMENT dedup — the quote/boilerplate-inclusion
      // duplication Jaccard structurally misses (a 12-token excerpt inside
      // a 50-token host has jac ≈ 0.2 but containment 1.0). Corpus = the
      // documents table PLUS one planted EXCERPT per seventh doc (its
      // first 12 tokens — a deterministic string both engines rebuild
      // identically), so the expected pair set is non-vacuous at every SF
      // and grows linearly. Planted ids are −id−1: collision-free with
      // the nonnegative real ids at ANY scale factor (the emb_near_dup
      // convention — a fixed +offset collides once the table outgrows it,
      // and a collided id would make the per-row-distinct shingle table
      // diverge from the oracle's global DISTINCT). Same df-capped
      // inverted-index candidate machinery as dedup_ngram_jaccard (cap
      // mirrored in the oracle); the verify computes exact containment
      // n_inter/min(|A|,|B|) over FULL shingle sets.
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"))
        val planted = base.where(col("doc_id") % 7 === 0)
          .select((-col("doc_id") - 1).as("doc_id"),
            array_join(slice(split(col("text"), "\\s+"), 1, 12), " ").as("text"))
        Dedup.ngramContainmentPairs(base.unionByName(planted), "doc_id", "text",
            shingleN = 3, threshold = 0.8, maxDf = 10)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT -doc_id - 1,
            array_to_string(string_split_regex(text, '\s+')[1:12], ' ')
          FROM documents WHERE doc_id % 7 = 0),
        tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM docs),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        kept AS (SELECT doc_id, shingle FROM (
          SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
          WHERE df <= 10),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(n_inter AS DOUBLE) / CAST(least(za.n_sh, zb.n_sh) AS DOUBLE) AS containment
        FROM inter JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / CAST(least(za.n_sh, zb.n_sh) AS DOUBLE) >= 0.8
        ORDER BY doc_a, doc_b""")),

    QueryDef("mix_cluster_balance",
      // semantic topic balancing for a training mix: k-means clusters over
      // the exact integer lattice (the ann_ivf_fit construct, so the
      // ENTIRE iterative fit replays in SQL), then at most 20 picks per
      // cluster by the deterministic (md5(id), id) draw — head clusters
      // truncate to the cap, tail clusters survive whole, and the pick is
      // reproducible at any partitioning. The window is PARTITIONED by
      // cluster and WindowGroupLimit pre-truncates to the cap before the
      // exchange, so the shuffle never carries the corpus order.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("embedding"))
        val cents = Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 8, iters = 2, seedKey = c => md5(c.cast("string")))
        val labeled = e.withColumn("cluster",
          Similarity.nearestCentroid(col("embedding"), cents))
        Sampling.clusterBalancedSample(labeled, col("vec_id"), col("cluster"),
            perCluster = 20)
          .select(col("cluster"), col("pick_rank"), col("vec_id"))
          .orderBy(col("cluster"), col("pick_rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        ${kmeansCtesSql(k = 8, iters = 2)},
        lab AS (SELECT vec_id, cluster FROM (
            SELECT b.vec_id, CAST(c.j AS INTEGER) AS cluster,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM base b CROSS JOIN c2 c) WHERE rn = 1),
        pick AS (SELECT cluster, vec_id,
            CAST(row_number() OVER (PARTITION BY cluster
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER) AS pick_rank
          FROM lab)
        SELECT cluster, pick_rank, vec_id FROM pick WHERE pick_rank <= 20
        ORDER BY cluster, pick_rank""")),

    QueryDef("txt_ngram_novelty",
      // per-doc n-gram novelty against the stream so far (first occurrence
      // by ascending doc_id): the diminishing-returns curve a growing
      // corpus is monitored by — "this crawl batch adds X% new trigrams".
      // One linear explode → min-per-shingle → join-back census; exact
      // integer-millionths ratio. The summary groups docs into 10 equal
      // id-deciles so the DECAY CURVE itself is the hashed result (and the
      // row count stays bounded at any SF).
      (s, d) => {
        val nov = TextAnalysis.ngramNovelty(t(s, d, "documents"), "doc_id", "text",
          shingleN = 3)
        // max(doc_id) stays INSIDE the plan as a cross-joined 1-row scalar
        // aggregate (the oracle's mx CTE shape): an eager .head() here
        // would run a real scan job at DataFrame-CONSTRUCTION time (every
        // plan-only consumer pays it, e.g. the PlanSpec lint walking
        // Queries.all) and NPE on an empty documents table
        val mx = t(s, d, "documents").agg(max(col("doc_id")).as("_mx"))
        nov.crossJoin(mx)
          .withColumn("decile",
            expr("CAST(least(doc_id * 10 div (_mx + 1), 9) AS INT)"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_shingles")).as("sum_shingles"),
            sum(col("n_novel")).as("sum_novel"),
            expr("CAST(1000000 * sum(n_novel) div sum(n_shingles) AS BIGINT)")
              .as("novelty_millionths"))
          .orderBySmall(col("decile"))
      },
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
        fst AS (SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY 1),
        census AS (SELECT sh.doc_id, count(*) AS n_shingles,
            sum(CASE WHEN fst.first_id = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
          FROM sh JOIN fst ON fst.shingle = sh.shingle GROUP BY 1),
        per AS (SELECT d.doc_id,
            coalesce(c.n_shingles, 0) AS n_shingles, coalesce(c.n_novel, 0) AS n_novel
          FROM documents d LEFT JOIN census c ON c.doc_id = d.doc_id),
        mx AS (SELECT max(doc_id) AS m FROM documents)
        SELECT CAST(least(p.doc_id * 10 // (mx.m + 1), 9) AS INTEGER) AS decile,
          count(*) AS n_docs,
          CAST(sum(n_shingles) AS BIGINT) AS sum_shingles,
          CAST(sum(n_novel) AS BIGINT) AS sum_novel,
          CAST(1000000 * sum(n_novel) // sum(n_shingles) AS BIGINT) AS novelty_millionths
        FROM per p, mx GROUP BY 1 ORDER BY 1""")),

    QueryDef("mix_source_overlap",
      // cross-source exact-duplication matrix — which crawls duplicate
      // each other (two snapshots of one crawl → drop one; independent
      // sources sharing boilerplate → scrub it). The driver corpus has no
      // natural exact dups, so every 9th doc is re-planted under a
      // 'mix_'-prefixed source: the expected matrix is one row per
      // original source with its mirror, counts = that source's planted
      // share — non-vacuous and linear at any SF. Self-join on md5(text)
      // (32-hex shuffle keys, never bodies), fanout bounded by source
      // cardinality.
      (s, d) => {
        val base = t(s, d, "documents").select(col("doc_id"), col("text"), col("source"))
        val planted = base.where(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text"),
            concat(lit("mix_"), col("source")).as("source"))
        Dedup.crossSourceExactOverlap(base.unionByName(planted), "text", "source")
          .orderBySmall(col("source_a"), col("source_b"))
      },
      Some("""WITH docs2 AS (
          SELECT text, source FROM documents
          UNION ALL
          SELECT text, 'mix_' || source FROM documents WHERE doc_id % 9 = 0),
        st AS (SELECT DISTINCT md5(text) AS h, source FROM docs2)
        SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_texts
        FROM st a JOIN st b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_train_split",
      // deterministic 80/10/10 train/val/test assignment — a pure
      // projection over the hash bucket, identically replayable in SQL;
      // the per-split counts and id ranges are the audit a corpus release
      // ships with
      (s, d) => t(s, d, "documents")
        .withColumn("split", Sampling.assignSplit(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBySmall(col("split")),
      Some("""SELECT CASE
          WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
          WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
          ELSE 'test' END AS split,
          count(*) AS cnt, min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("dedup_incremental",
      // the daily-batch dedup shape: incoming (odd doc_ids) near-dup-paired
      // against history (even doc_ids) via a cross-side LSH bucket join —
      // history is NEVER self-paired, the per-batch cost the production
      // ledger pays. Same minhash arithmetic as dedup_minhash_jaccard,
      // mirrored cross-side in the oracle.
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.incrementalNearDupPairs(
            docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
            "doc_id", "text", shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)
          .orderBy(col("doc_new"), col("doc_old"))
      },
      Some(minhashIncrementalOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2,
        threshold = 0.1))),

    QueryDef("pipeline_daily_batch",
      // the production daily-batch chain end to end: incoming batch (odd
      // doc_ids) → near-dedup against history (even doc_ids, cross-side
      // LSH — never self-paired) → drop matched → deterministic split
      // assignment → per-split release counts. Every stage is the same
      // definition its standalone key checks, so the whole chain is
      // oracle-checkable as one SQL expression.
      (s, d) => {
        val docs = t(s, d, "documents")
        val hist = docs.where(col("doc_id") % 2 === 0)
        val inc = docs.where(col("doc_id") % 2 === 1)
        val pairs = Dedup.incrementalNearDupPairs(hist, inc, "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)
        Dedup.applyIncrementalDedup(inc, "doc_id", pairs)
          .withColumn("split", Sampling.assignSplit(col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)))
          .groupBy(col("split")).agg(count(lit(1)).as("cnt"))
          .orderBySmall(col("split"))
      },
      Some(s"""WITH inc_pairs AS (
          ${minhashIncrementalOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.1)})
        SELECT CASE
          WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
          WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
          ELSE 'test' END AS split, count(*) AS cnt
        FROM documents d WHERE doc_id % 2 = 1
          AND NOT EXISTS (SELECT 1 FROM inc_pairs p WHERE p.doc_new = d.doc_id)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("pipeline_web_curation",
      // RefinedWeb/CCNet-style WEB curation funnel as ONE oracled chain,
      // composing this round's first-class ops end to end over the
      // planted-URL corpus: domain blocklist (any blocked mention drops
      // the doc) → word-count/alphabetic quality gate (the c4Filters
      // columns) → bigram boilerplate cap (per-doc mean transition
      // frequency ≤ 1.05× corpus mean) → canonical-URL inventory of the
      // survivors. Output
      // is the single-row retention funnel; every stage is the same
      // definition its standalone key hash-checks.
      (s, d) => {
        import s.implicits._
        val blocklist = Seq("src3.org", "src7.net", "src15.org").toDF("domain")
        val docs = urlDocs(s, d)
        val kept1 = Web.domainBlocklistFilter(docs, "doc_id", "text2", blocklist)
        val c4ok = TextAnalysis.c4Filters(kept1, "doc_id", "text")
          .where(col("n_words") >= 20 && col("n_alpha_words") * 10 >= col("n_words") * 8)
          .select(col("doc_id"))
        val kept2 = kept1.join(c4ok, Seq("doc_id"), "left_semi")
        // boilerplate = unusually COMMON transitions relative to the corpus
        // (scale-free: a fixed absolute threshold would stop firing as the
        // corpus grows — mean bigram counts scale with it). Keep docs with
        // per-doc mean bigram frequency ≤ 1.05× the corpus mean (this
        // corpus is homogeneous — measured per-doc/corpus mean ratio spans
        // 0.90..1.14 — so the cap sits inside the observed tail and
        // provably fires at every SF). The cross-products are compared in
        // DOUBLE with the identical association both sides — long
        // cross-products would overflow int64 at web scale (per-doc sum ×
        // corpus total ≈ 1e20+), and an identically-sequenced chain of
        // exactly-rounded double multiplies is engine-deterministic.
        val bs = TextAnalysis.bigramLmScore(kept2, "doc_id", "text")
        val tot = bs.agg(sum(col("sum_bigram_cnt")).as("ts"), sum(col("n_bigrams")).as("tn"))
        val bsOk = bs.crossJoin(tot)
          .where(col("sum_bigram_cnt").cast("double") * col("tn").cast("double") * 100.0 <=
            col("n_bigrams").cast("double") * col("ts").cast("double") * 105.0)
          .select(col("doc_id"))
        val kept3 = kept2.join(bsOk, Seq("doc_id"), "left_semi")
        val canon = kept3.select(col("doc_id"), explode(
            regexp_extract_all(col("text2"), lit("(?i)https?://[^\\s]+"), lit(0))).as("url"))
          .select(Web.canonicalizeUrl(col("url")).as("cu"))
        docs.agg(count(lit(1)).as("n_total"))
          .crossJoin(kept1.agg(count(lit(1)).as("n_after_blocklist")))
          .crossJoin(kept2.agg(count(lit(1)).as("n_after_quality")))
          .crossJoin(kept3.agg(count(lit(1)).as("n_after_boilerplate")))
          .crossJoin(canon.agg(count(lit(1)).as("n_urls"),
            countDistinct(col("cu")).as("n_canonical_urls")))
      },
      Some(s"""WITH $urlDocsSql,
        hit AS (SELECT DISTINCT doc_id FROM rd
          WHERE domain IN ('src3.org', 'src7.net', 'src15.org')),
        k1 AS (SELECT doc.doc_id, doc.text, d2.text2 FROM documents doc
          JOIN d2 ON doc.doc_id = d2.doc_id
          LEFT JOIN hit ON doc.doc_id = hit.doc_id WHERE hit.doc_id IS NULL),
        kt AS (SELECT doc_id, text2,
            list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks FROM k1),
        k2 AS (SELECT doc_id, text2, toks FROM kt
          WHERE len(toks) >= 20
            AND len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) * 10 >= len(toks) * 8),
        bg AS (SELECT doc_id,
            unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
          FROM k2),
        bc AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1),
        bs AS (SELECT doc_id, count(*) AS n_bigrams,
            CAST(sum(cnt) AS BIGINT) AS sum_cnt
          FROM bg JOIN bc USING (bigram) GROUP BY 1),
        tot AS (SELECT CAST(sum(sum_cnt) AS BIGINT) AS ts,
            CAST(sum(n_bigrams) AS BIGINT) AS tn FROM bs),
        k3 AS (SELECT k2.doc_id, k2.text2 FROM k2 JOIN bs ON k2.doc_id = bs.doc_id
          CROSS JOIN tot
          WHERE CAST(bs.sum_cnt AS DOUBLE) * CAST(tot.tn AS DOUBLE) * 100.0 <=
            CAST(bs.n_bigrams AS DOUBLE) * CAST(tot.ts AS DOUBLE) * 105.0),
        u AS (SELECT doc_id, unnest(regexp_extract_all(text2, '(?i)https?://[^\\s]+', 0)) AS url
          FROM k3),
        ${canonicalCteSql("u")}
        SELECT (SELECT count(*) FROM documents) AS n_total,
          (SELECT count(*) FROM k1) AS n_after_blocklist,
          (SELECT count(*) FROM k2) AS n_after_quality,
          (SELECT count(*) FROM k3) AS n_after_boilerplate,
          (SELECT count(*) FROM canon) AS n_urls,
          (SELECT CAST(count(DISTINCT canonical_url) AS BIGINT) FROM canon) AS n_canonical_urls""")),

    QueryDef("op_salted_join",
      // explicit skew-salted shuffle join (Joins.skewSaltedJoin): the salt
      // never changes the answer — the oracle is the PLAIN join — it only
      // spreads each hot key over saltFactor reducers. The driver row
      // proves result-invariance; the salting plan shape (probe-side
      // deterministic salt, build-side saltFactor replication) is asserted
      // in JoinsSpec.
      (s, d) => Joins.skewSaltedJoin(
          t(s, d, "lineitem").select(col("l_orderkey").as("okey"), col("l_quantity")),
          t(s, d, "orders").select(col("o_orderkey").as("okey"), col("o_orderpriority")),
          Seq("okey"), saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity"), 20, 2).as("qty"))
        .orderBySmall(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority, count(*) AS cnt, ${dsumSql("l_quantity", 20, 2)} AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")),

    // ---- similarity search (north star) ----
    QueryDef("ann_cosine_topk",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.bruteForceTopK(e.where(annQueryPred), e, "vec_id", "embedding", 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2048),
        s AS (SELECT qid, vec_id AS nid,
          list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * embedding[i]::DOUBLE)) /
          (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
           sqrt(list_sum(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS sim
          FROM embeddings CROSS JOIN q WHERE vec_id <> qid)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("emb_quantize_int8",
      // symmetric per-vector int8 quantization, exploded to scalar rows so
      // the hash compare sees every quantized component; floor(·+0.5)
      // halfway semantics are engine-exact (Queries scaladoc / Similarity)
      (s, d) => Similarity.quantizeInt8(t(s, d, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), posexplode(col("q")).as(Seq("idx", "qval")), col("scale"))
        .orderBy(col("vec_id"), col("idx")),
      Some("""SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS idx,
          unnest([CASE WHEN m = 0 THEN 0 ELSE CAST(floor(CAST(x AS DOUBLE)/m*127 + 0.5) AS INTEGER) END
            FOR x IN embedding]) AS qval,
          m AS scale
        FROM (SELECT vec_id, embedding,
            CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS m
          FROM embeddings)
        ORDER BY vec_id, idx""")),

    QueryDef("ann_quantized_topk",
      // int8-quantized cosine top-k: scales cancel in the cosine, so the
      // score is pure integer arithmetic in double — bit-identical across
      // engines, making this the ONE fully hash-checkable ANN variant
      // (float-cosine ann_cosine_topk checks ids only; IVF is rows-only).
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.quantizedTopK(e.where(annQueryPred), e, "vec_id", "embedding", 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH qz AS (
          SELECT vec_id, CASE WHEN m = 0 THEN [0 FOR x IN embedding]
            ELSE [CAST(floor(CAST(x AS DOUBLE)/m*127 + 0.5) AS INTEGER) FOR x IN embedding] END AS q
          FROM (SELECT vec_id, embedding,
              CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS m
            FROM embeddings)),
        s AS (SELECT qz.vec_id AS qid, c.vec_id AS nid,
            list_inner_product(qz.q, c.q) /
              (sqrt(list_inner_product(qz.q, qz.q)) * sqrt(list_inner_product(c.q, c.q))) AS sim
          FROM qz CROSS JOIN qz c WHERE qz.vec_id % 10 = 0 AND qz.vec_id < 2048 AND c.vec_id <> qz.vec_id)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id, sim FROM (
          SELECT qid, nid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("ann_ivf_topk",
      // construct-and-check (the mm_video_meta/op05 pattern, applied to
      // IVF): the real embeddings' float centroid means are partition-
      // order dependent in the last ulp, so this key was rows-only. The
      // vectors here are an INTEGER-LATTICE derivation of vec_id (values
      // in [-5,7], exactly representable in float32): per-dim centroid
      // sums are then exact in double REGARDLESS of partition order, the
      // mean is one correctly-rounded division, and every cosine is the
      // same exactly-rounded (*,/,sqrt) arithmetic both engines already
      // hash-agree on for ann_cosine_topk — so the full route→probe→rank
      // pipeline (the REAL ivfTopK operator, centroids included) is
      // hash-checkable. Multipliers are coprime to the 11 modulus (no
      // degenerate constant dims except none); dim 0 is id%7+1 >= 1 so no
      // zero-norm vector exists at any scale factor.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          latticeVec.as("embedding"))
        Similarity.ivfTopK(e.where(annQueryPred), e, "vec_id", "embedding",
            "label", k = 5, nprobe = 3)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        ${meanCteSql("base", "label", "cent")},
        ${ivfTailSql("base", "label", nprobe = 3)}""")),

    QueryDef("ann_ivf_fit",
      // the END-TO-END fresh-corpus IVF path: Lloyd's k-means fit
      // (deterministic seeds, one job per iteration, centroids broadcast
      // back as expression literals) → fitted cluster routing → ivfTopK.
      // Hash-checked via the same integer-lattice construct as
      // ann_ivf_topk: lattice means are exact in any partition order, so
      // the oracle can replay the ENTIRE iterative fit — seeds drawn by
      // the engine-portable (md5(id), id) key (DuckDB has no xxhash64),
      // then 3 unrolled assign/mean rounds with empty-cluster carryover,
      // then the fitted routing. Float-embedding recall-vs-brute-force
      // stays a SimilaritySpec property.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          latticeVec.as("embedding"))
        // route with the FITTED centroids (the FAISS-standard design): the
        // fit already holds them as driver values, so routing costs no
        // centroid re-aggregation pass and no broadcast build
        val cents = Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 16, iters = 3, seedKey = c => md5(c.cast("string")))
        val labeled = e.withColumn("cluster",
          Similarity.nearestCentroid(col("embedding"), cents))
        Similarity.ivfTopKFitted(labeled.where(annQueryPred), labeled,
            "vec_id", "embedding", "cluster", k = 5, nprobe = 4, cents)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        ${kmeansCtesSql(k = 16, iters = 3)},
        lab AS (SELECT vec_id, v, j AS lbl FROM (
            SELECT b.vec_id, b.v, c.j,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM base b CROSS JOIN c3 c) WHERE rn = 1),
        cent AS (SELECT j AS lbl, c FROM c3),
        ${ivfTailSql("lab", "lbl", nprobe = 4)}""")),

    QueryDef("ann_pq_topk",
      // Product quantization + ADC (the FAISS memory regime: vectors →
      // m small codes, query↔code distance = m table lookups), on the
      // integer lattice so the WHOLE pipeline is hash-exact. The codebooks
      // here are the even product grid {-4,-2,0,2,4,6}² per 2-dim
      // subspace, in lexicographic order: squared-L2 over an axis-aligned
      // product grid minimizes PER COORDINATE, and the tie rule (lowest
      // code index = lexicographically smallest entry) picks the LOWER
      // even neighbor for odd values — so the real 36-way argmin the
      // operator runs has the closed form per dim
      //   q(v) = greatest(-4, least(6, v - abs(v % 2)))
      // which is what the oracle replays (pqTrain's Lloyd's trainer is
      // exercised in SimilaritySpec; grid books keep the SQL analytic).
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("v"))
        val codes = Similarity.pqEncode(base, "vec_id", "v", pqGridBooks)
        Similarity.pqAdcTopK(base.where(annQueryPred), codes,
            "vec_id", "v", pqGridBooks, k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            (-col("sim")).cast("int").as("adc_dist"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        iv AS (SELECT vec_id, [CAST(v[i] AS INTEGER) FOR i IN generate_series(1, $LatDims)] AS w FROM base),
        codes AS (SELECT vec_id,
            [GREATEST(-4, LEAST(6, w[i] - ABS(w[i] % 2))) FOR i IN generate_series(1, $LatDims)] AS q
          FROM iv),
        scored AS (SELECT b.vec_id AS qid, c.vec_id AS nid,
            list_sum([(b.w[i] - c.q[i]) * (b.w[i] - c.q[i]) FOR i IN generate_series(1, $LatDims)]) AS dist
          FROM iv b JOIN codes c ON c.vec_id <> b.vec_id WHERE b.vec_id % 10 = 0 AND b.vec_id < 2048)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id,
          CAST(dist AS INTEGER) AS adc_dist FROM (
          SELECT qid, nid, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rank
          FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("ann_pq_rerank",
      // the production TWO-STAGE retrieval shape: coarse PQ/ADC recall
      // (top-20 shortlist per query — compressed codes, m lookups per
      // pair) → EXACT cosine re-rank of the shortlist (top-5). Both
      // stages on the integer lattice, so the oracle replays the whole
      // funnel: the ADC stage via the product-grid closed form (see
      // ann_pq_topk) and the re-rank via the same exactly-rounded cosine
      // arithmetic every ANN oracle hash-agrees on.
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("v"))
        val codes = Similarity.pqEncode(base, "vec_id", "v", pqGridBooks)
        val cand = Similarity.pqAdcTopK(base.where(annQueryPred),
          codes, "vec_id", "v", pqGridBooks, k = 20)
        Similarity.rerankExact(cand, base, "vec_id", "v", k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        iv AS (SELECT vec_id, [CAST(v[i] AS INTEGER) FOR i IN generate_series(1, $LatDims)] AS w FROM base),
        codes AS (SELECT vec_id,
            [GREATEST(-4, LEAST(6, w[i] - ABS(w[i] % 2))) FOR i IN generate_series(1, $LatDims)] AS q
          FROM iv),
        scored AS (SELECT b.vec_id AS qid, c.vec_id AS nid,
            list_sum([(b.w[i] - c.q[i]) * (b.w[i] - c.q[i]) FOR i IN generate_series(1, $LatDims)]) AS dist
          FROM iv b JOIN codes c ON c.vec_id <> b.vec_id WHERE b.vec_id % 10 = 0 AND b.vec_id < 2048),
        cand AS (SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS r
            FROM scored) WHERE r <= 20),
        ex AS (SELECT c.qid, c.nid, ${cosSql("bq.v", "bn.v")} AS sim
          FROM cand c JOIN base bq ON c.qid = bq.vec_id JOIN base bn ON c.nid = bn.vec_id)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
          FROM ex) WHERE rank <= 5 ORDER BY query_id, rank""")),

    QueryDef("emb_near_dup",
      // The driver embeddings have NO true near-dups (measured max pairwise
      // cosine 0.479), and at cos 0.4 SRP-LSH is ~N^1.66 for ANY parameters
      // (round 1 ran it there with 8-bucket tables — quadratic). The query
      // now exercises the operator in its design regime: plant a
      // deterministic near-dup of every vector (±2% per-dim scaling →
      // cos ≈ 0.9997) and find the planted pairs at threshold 0.9 with the
      // scale-correct defaults (20-bit tables, 1-bit multiprobe). Planted
      // ids are −id−1: collision-free with the nonnegative real ids at ANY
      // scale factor (a fixed +offset would collide once the table outgrows
      // it).
      //
      // Oracle = the analytically-expected planted pair set (the
      // emb_semantic_dedup pattern): the ±2% per-dim perturbation bounds
      // the planted angle (cos >= ~0.9996 > 0.9 for EVERY vector), while
      // naturals top out at cos 0.479 and natural×planted at ~0.49 — so
      // the exact expected output is one (−id−1, id) pair per vector, and
      // the hash check asserts 100% LSH recall on the planted pairs AND
      // zero false positives. (The LSH mechanics need no SQL mirror; at
      // cos 0.9997 the 8-table/1-bit-multiprobe miss probability is ~1e-16
      // per pair, and on the driver's FIXED corpus recall is a determinism,
      // verified by this very hash compare.)
      (s, d) => {
        val e = t(s, d, "embeddings")
        val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val pert = e.select((-col("vec_id") - lit(1L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0) + lit(0.02) * sin(col("vec_id") + i))).as("embedding"))
        Similarity.embeddingNearDupPairs(base.unionByName(pert), "vec_id", "embedding",
            threshold = 0.9)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""SELECT CAST(-vec_id - 1 AS BIGINT) AS id_a, vec_id AS id_b
        FROM embeddings ORDER BY 1, 2""")),

    QueryDef("emb_semantic_dedup",
      // SemDeDup end to end: corpus PLUS one planted EXACT copy of every
      // vector at id −v−1 (collision-free at any scale, as emb_near_dup).
      // Identical vectors share every SRP bucket and verify at cos 1.0, so
      // each {v, −v−1} pair clusters and the min-id (negative) survives —
      // the oracle is therefore the exact expected survivor set: the hash
      // check asserts 100% recall on planted copies AND zero false merges
      // among the naturals (max natural pairwise cosine 0.479 ≪ 0.9).
      // Float-safe to oracle BECAUSE copies are exact: bucket bits and the
      // cos=1 verify cannot flip on engine ulp differences.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val planted = e.select((-col("vec_id") - lit(1L)).as("vec_id"), col("embedding"))
        Similarity.semanticDedup(e.unionByName(planted), "vec_id", "embedding",
            threshold = 0.9)
          .select(col("vec_id")).orderBy(col("vec_id"))
      },
      Some("SELECT -vec_id - 1 AS vec_id FROM embeddings ORDER BY vec_id")),

    // ---- multimodal plumbing (north star; decode is STUBBED, see Multimodal) ----
    QueryDef("mm_binary_meta",
      (s, d) => Multimodal.attachPayload(t(s, d, "documents"), "text", "text/plain")
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        md5(text) AS checksum FROM documents ORDER BY doc_id""")),

    QueryDef("txt_substring_dups",
      // exact repeated-substring signal (window-hash form of suffix-array
      // substring dedup): per doc, how many of its 8-token windows occur
      // more than once anywhere in the corpus, and where the first one is
      (s, d) => TextAnalysis.substringDupStats(t(s, d, "documents"), "doc_id", "text",
          windowTokens = 8)
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        win AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
            toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
            toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS w
          FROM tk, unnest(generate_series(1, len(toks) - 7)) AS g(i)
          WHERE len(toks) >= 8),
        c AS (SELECT w, count(*) AS cnt FROM win GROUP BY 1)
        SELECT win.doc_id, count(*) AS n_windows,
          CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
          CAST(coalesce(min(CASE WHEN c.cnt > 1 THEN win.pos END), 0) AS INTEGER) AS first_dup_pos,
          CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_frac
        FROM win JOIN c USING (w)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_dedup_spans",
      // the APPLY half of substring dedup: every duplicated 8-token window
      // occurrence except the globally-first is cut, text rebuilt from the
      // surviving tokens (greedy overlap policy; see scaladoc)
      (s, d) => TextAnalysis.removeDupWindowSpans(t(s, d, "documents"), "doc_id", "text",
          windowTokens = 8)
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        win AS (SELECT doc_id, CAST(i AS INTEGER) AS pos,
            toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
            toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7] AS w
          FROM tk, unnest(generate_series(1, len(toks) - 7)) AS g(i)
          WHERE len(toks) >= 8),
        fo AS (SELECT w, min(doc_id * 100000 + pos) AS mk FROM win GROUP BY 1),
        rem AS (SELECT win.doc_id, win.pos FROM win JOIN fo USING (w)
          WHERE win.doc_id * 100000 + win.pos <> fo.mk),
        cov AS (SELECT DISTINCT doc_id, CAST(pos + i AS INTEGER) AS tokpos
          FROM rem, unnest(generate_series(0, 7)) AS g(i)),
        tok AS (SELECT doc_id, CAST(i AS INTEGER) AS tokpos, toks[i] AS tok
          FROM tk, unnest(generate_series(1, len(toks))) AS g(i)),
        kept AS (SELECT t.doc_id, t.tokpos, t.tok FROM tok t
          LEFT JOIN cov ON t.doc_id = cov.doc_id AND t.tokpos = cov.tokpos
          WHERE cov.doc_id IS NULL),
        reb AS (SELECT doc_id, count(*) AS n_kept,
            string_agg(tok, ' ' ORDER BY tokpos) AS clean_text
          FROM kept GROUP BY 1),
        tt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk WHERE len(toks) > 0)
        SELECT tt.doc_id, tt.n_tokens,
          tt.n_tokens - coalesce(reb.n_kept, 0) AS n_removed,
          coalesce(reb.clean_text, '') AS clean_text
        FROM tt LEFT JOIN reb ON tt.doc_id = reb.doc_id
        ORDER BY tt.doc_id""")),

    QueryDef("txt_heavy_hitters",
      // count-min sketch heavy hitters with the certified-accuracy oracle
      // (exact top-20 token counts + flags for exact ≤ est ≤ exact+⌈eps·N⌉);
      // completes the sketch family: HLL, GK, Bloom, CMS
      (s, d) => TextAnalysis.heavyHittersCertified(
          t(s, d, "documents")
            .select(explode(TextAnalysis.tokens(col("text"))).as("token")),
          "token", k = 20)
        .orderBySmall(col("cnt").desc, col("item")),
      Some("""WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS item
          FROM documents)
        SELECT item, count(*) AS cnt, TRUE AS within_cms_bounds
        FROM tok GROUP BY 1 ORDER BY cnt DESC, item LIMIT 20""")),

    QueryDef("txt_unigram_freq",
      // corpus-frequency quality score: mean corpus frequency of each doc's
      // tokens. Integer sums + one final multiply/divide — bit-identical
      // across engines by construction (no logs)
      (s, d) => TextAnalysis.unigramFreqScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
          FROM documents),
        c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        SELECT doc_id, count(*) AS n_tokens, CAST(sum(cnt) AS BIGINT) AS sum_cnt,
          CAST(sum(cnt) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * CAST((SELECT total FROM tt) AS DOUBLE)) AS avg_unigram_freq
        FROM tok JOIN c USING (token)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("mm_image_dims",
      // header-metadata extraction from opaque binary with NO codec: build
      // a real big-endian PNG IHDR from each row's ids, then parse the
      // bytes back with substring/hex/conv expressions (construct-and-parse
      // — the op05_fixed_width trick applied to binary). The oracle derives
      // the dims arithmetically; matching proves the byte round-trip.
      (s, d) => {
        val e = t(s, d, "embeddings")
        val withPng = e.select(col("vec_id"),
          Multimodal.pngHeader(col("vec_id") % 1024 + 16, (col("vec_id") * 7) % 768 + 16)
            .as("payload"))
        Multimodal.imageDims(withPng, "payload")
          .select(col("vec_id"), col("width"), col("height"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, CAST(vec_id % 1024 + 16 AS INTEGER) AS width,
        CAST((vec_id * 7) % 768 + 16 AS INTEGER) AS height
        FROM embeddings ORDER BY vec_id""")),

    QueryDef("mm_decode_real",
      // REAL codec roundtrip, oracle-checked: encode a solid-color PNG per
      // row with the JDK's ImageIO (executor-side, partition-parallel),
      // decode it back with Multimodal.decodeImageFeatures, and emit
      // dims + channel means. PNG is lossless and the color is solid, so
      // the decoded means equal the constructed channel values EXACTLY —
      // lettng a SQL oracle verify an actual image-codec path arithmetically.
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 25 === 0).as[Long]
        val png = ids.mapPartitions { it =>
          it.map { id =>
            val w = (id % 13 + 3).toInt; val h = (id % 7 + 2).toInt
            val rgb = (((id % 256) << 16) | (((id * 3) % 256) << 8) | ((id * 7) % 256)).toInt
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        Multimodal.decodeImageFeatures(png, "vec_id")
          .select(col("id").as("vec_id"), col("width"), col("height"),
            col("mean_r"), col("mean_g"), col("mean_b"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, CAST(vec_id % 13 + 3 AS INTEGER) AS width,
        CAST(vec_id % 7 + 2 AS INTEGER) AS height,
        CAST(vec_id % 256 AS DOUBLE) AS mean_r,
        CAST((vec_id * 3) % 256 AS DOUBLE) AS mean_g,
        CAST((vec_id * 7) % 256 AS DOUBLE) AS mean_b
        FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id""")),

    QueryDef("mm_image_ahash",
      // perceptual average-hash through the REAL codec path, oracle-
      // checked: encode a 16×16 PNG per row with the left `vec_id % 17`
      // columns black and the rest white, then Multimodal.imageAHash
      // (decode → integer 8×8 box luma → cross-multiplied mean
      // threshold). The split construct makes every hash bit analytic —
      // a cell is 1 iff it is white, or is the boundary cell of a
      // majority-black image, or the image is all black — so the oracle
      // derives the full 64-bit hash (8 identical row bytes) from
      // vec_id alone, and the codec + hash pipeline must reproduce it
      // bit for bit
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 19 === 0).as[Long]
        val png = ids.mapPartitions { it =>
          it.map { id =>
            val lw = (id % 17).toInt
            val img = new java.awt.image.BufferedImage(16, 16,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < 16) {
              var y = 0
              val c = if (x < lw) 0x000000 else 0xffffff
              while (y < 16) { img.setRGB(x, y, c); y += 1 }
              x += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        Multimodal.imageAHash(png, "vec_id")
          .select(col("id").as("vec_id"), col("ok"), col("ahash_hex"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH sel AS (SELECT vec_id, vec_id % 17 AS lw FROM embeddings WHERE vec_id % 19 = 0),
        rb AS (SELECT vec_id, lw,
          (SELECT CAST(sum(CASE WHEN lw = 16 OR 2 * cx >= lw
              OR (lw % 2 = 1 AND 2 * cx + 1 = lw AND lw >= 8)
            THEN 1 << (7 - cx) ELSE 0 END) AS BIGINT)
           FROM generate_series(0, 7) AS t(cx)) AS rowbyte
        FROM sel)
        SELECT vec_id, true AS ok, repeat(printf('%02x', rowbyte), 8) AS ahash_hex
        FROM rb ORDER BY vec_id""")),

    QueryDef("mm_audio_real",
      // REAL audio codec roundtrip, oracle-checked (mm_decode_real's
      // pattern for sound): encode constant-amplitude 16-bit PCM WAVs with
      // the JDK's AudioSystem executor-side, decode with
      // decodeAudioFeatures — constant samples make peak and mean |amp|
      // equal the constructed amplitude exactly
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 37 === 0).as[Long]
        val wav = ids.mapPartitions { it =>
          it.map { id =>
            val amp = (id % 3000 + 100).toShort
            val nFrames = (id % 500 + 50).toInt
            val pcm = new Array[Byte](nFrames * 2)
            var i = 0
            while (i < nFrames) {
              pcm(2 * i) = (amp & 0xff).toByte; pcm(2 * i + 1) = (amp >> 8).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        Multimodal.decodeAudioFeatures(wav, "vec_id")
          .select(col("id").as("vec_id"), col("sample_rate"), col("channels"),
            col("n_frames"), col("peak"), col("mean_abs"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, 8000 AS sample_rate, 1 AS channels,
        CAST(vec_id % 500 + 50 AS BIGINT) AS n_frames,
        CAST(vec_id % 3000 + 100 AS INTEGER) AS peak,
        CAST(vec_id % 3000 + 100 AS DOUBLE) AS mean_abs
        FROM embeddings WHERE vec_id % 37 = 0 ORDER BY vec_id""")),

    QueryDef("pipeline_multimodal",
      // multimodal curation in one chain: per doc, a REAL PNG (dims derived
      // from the row, encoded+decoded with actual codecs executor-side)
      // joined back to text-side token counts, then filtered on BOTH
      // modalities (image area + text length) — the image-and-caption
      // curation shape, with the codec path inside the oracle check
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val base = docs.select(col("doc_id"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        val png = base.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
          .mapPartitions { it =>
            it.map { case (id, nChars) =>
              val w = (nChars % 20 + 4).toInt; val h = (id % 10 + 2).toInt
              val rgb = ((id % 256) << 16).toInt
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var x = 0
              while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              (id, bos.toByteArray)
            }
          }.toDF("doc_id", "payload")
        val feats = Multimodal.decodeImageFeatures(png, "doc_id")
          .select(col("id").as("doc_id"), col("width"), col("height"), col("mean_r"))
        base.join(feats, "doc_id")
          .where(col("width") * col("height") >= 50 && col("n_tokens") >= 30)
          .select(col("doc_id"), col("n_tokens"), col("width"), col("height"), col("mean_r"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (SELECT doc_id, n_chars,
          CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
          FROM documents),
        f AS (SELECT doc_id, n_tokens,
          CAST(n_chars % 20 + 4 AS INTEGER) AS width,
          CAST(doc_id % 10 + 2 AS INTEGER) AS height,
          CAST(doc_id % 256 AS DOUBLE) AS mean_r FROM tk)
        SELECT doc_id, n_tokens, width, height, mean_r FROM f
        WHERE width * height >= 50 AND n_tokens >= 30
        ORDER BY doc_id""")),

    QueryDef("mm_frame_sample",
      (s, d) => Multimodal.sampleFrames(
          Multimodal.attachPayload(t(s, d, "documents"), "text", "text/plain"),
          "doc_id", frameBytes = 100, everyNth = 2)
        .select(col("doc_id"), col("frame_no"), col("frame").cast("string").as("frame"))
        .orderBy(col("doc_id"), col("frame_no")),
      Some("""SELECT doc_id, CAST(fn AS INTEGER) AS frame_no, substring(text, CAST(fn AS INTEGER) * 100 + 1, 100) AS frame
        FROM documents, unnest(generate_series(0, CAST(ceil(len(text) / 100.0) AS INTEGER) - 1)) AS t(fn)
        WHERE fn % 2 = 0 ORDER BY doc_id, frame_no""")),

    QueryDef("mm_video_meta",
      // video-CONTAINER metadata without a codec: a deterministic minimal
      // MP4 (ftyp+moov[mvhd]+mdat) is constructed per doc, then the ISO-BMFF
      // box walk parses brand/box inventory/timescale/duration back out —
      // the same construct-and-check pattern as op05/txt_pii_scrub, so the
      // byte-level parser is hash-checked against the analytic oracle
      (s, d) => {
        val vids = t(s, d, "documents").select(col("doc_id"),
          Multimodal.mp4Sample(lit(1000L), pmod(col("doc_id") * 37, lit(86400000L))).as("payload"))
        Multimodal.mp4Meta(vids, "doc_id")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, true AS ok, 'isom' AS major_brand,
          CAST(3 AS INTEGER) AS n_boxes, 'ftyp,moov,mdat' AS box_types,
          CAST(1000 AS BIGINT) AS timescale,
          CAST(doc_id * 37 % 86400000 AS BIGINT) AS duration
        FROM documents ORDER BY doc_id""")),

    QueryDef("op_histogram",
      // fixed-bound equi-width histogram: one map-side-combined agg, ≤24
      // output rows at any SF; bucket index is exactly-rounded IEEE floor
      // arithmetic (identical in both engines even on edge values)
      (s, d) => Analytics.histogramFixed(
          t(s, d, "lineitem"), col("l_extendedprice"), 0.0, 5000.0, 24)
        .orderBySmall(col("bucket")),
      Some("""WITH b AS (SELECT CAST(least(greatest(floor((l_extendedprice - 0.0) / 5000.0), 0.0), 23.0) AS INTEGER) AS bucket
          FROM lineitem WHERE l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice))
        SELECT bucket, 0.0 + CAST(bucket AS DOUBLE) * 5000.0 AS lo_edge, count(*) AS n
        FROM b GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_quantile_grid",
      // certified grid quantiles: ONE mergeable bounded-state agg (200
      // counters) answers seven percentile queries with a deterministic
      // interval guarantee (error ≤ width) — the sketch-free alternative
      // to approx_percentile whose result is engine-replayable, so it
      // hash-checks (a t-digest/KLL answer is implementation-defined and
      // could not). Integer target ranks ⌈p·N/100⌉; the window cumsum and
      // the rank-location θ-join run over the ≤202-row bucket table, so
      // the single-partition window is metadata-sized at any SF
      (s, d) => Analytics.quantileGrid(
          t(s, d, "orders"), col("o_totalprice"), 0.0, 5000.0, 200,
          Seq(1, 25, 50, 75, 90, 99, 100))
        .orderBySmall(col("p")),
      Some("""WITH b0 AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          WHERE o_totalprice IS NOT NULL AND NOT isnan(CAST(o_totalprice AS DOUBLE))),
        b AS (SELECT CASE WHEN v < 0.0 THEN -1 WHEN v >= 1000000.0 THEN 200
          ELSE CAST(least(floor((v - 0.0) / 5000.0), 199.0) AS INTEGER) END AS bucket FROM b0),
        h AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
        c AS (SELECT bucket, n,
          sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM h),
        p AS (SELECT unnest([1, 25, 50, 75, 90, 99, 100]) AS p),
        pt AS (SELECT p.p, t.n_total, (p.p * t.n_total + 99) // 100 AS target FROM p, t),
        loc AS (SELECT p, n_total, target, min(bucket) AS bucket
          FROM pt JOIN c ON c.cum >= pt.target GROUP BY 1, 2, 3)
        SELECT p, n_total AS n_rows, target AS rank, bucket,
          CASE WHEN bucket < 0 THEN NULL ELSE 0.0 + CAST(bucket AS DOUBLE) * 5000.0 END AS q_lo,
          CASE WHEN bucket >= 200 THEN NULL ELSE 0.0 + CAST(bucket + 1 AS DOUBLE) * 5000.0 END AS q_hi,
          bucket >= 0 AND bucket < 200 AS certified
        FROM loc ORDER BY p""")),

    QueryDef("op_group_sample",
      // deterministic k-per-group inspection sample: the portable
      // (md5(key), key) shuffle order k-means seeding already uses; output
      // bounded by k·|groups| at any SF, stable across runs and engines
      (s, d) => Sampling.groupSample(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          col("source"), col("doc_id"), 5)
        .orderBySmall(col("source"), col("doc_id")),
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source,
            row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents) WHERE rk <= 5 ORDER BY source, doc_id""")),

    QueryDef("op_expectations",
      // Deequ-style data-quality report: ALL row-level checks in one
      // aggregation pass (adding a rule adds zero scans), plus the two
      // checks that need a shuffle by nature — key uniqueness and
      // referential integrity (anti-join orphans) — unioned into the same
      // long-format (check_name, n_violations, n_rows, passed) report
      (s, d) => {
        val o = t(s, d, "orders")
        val rowChecks = Analytics.expectations(o, Seq(
          "custkey_not_null" -> col("o_custkey").isNull,
          "orderdate_not_null" -> col("o_orderdate").isNull,
          "priority_in_domain" -> !col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
          "totalprice_positive" -> (col("o_totalprice").isNull || col("o_totalprice") <= 0.0)))
        rowChecks
          .unionByName(Analytics.uniquenessViolations(o, Seq(col("o_orderkey")), "orderkey_unique"))
          .unionByName(Analytics.orphanCount(o, col("o_custkey"),
            t(s, d, "customer"), col("c_custkey"), "custkey_references_customer"))
          .orderBySmall(col("check_name"))
      },
      Some("""WITH rep AS (
          SELECT 'custkey_not_null' AS check_name,
            CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
            count(*) AS n_rows FROM orders
          UNION ALL SELECT 'orderdate_not_null',
            CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM orders
          UNION ALL SELECT 'priority_in_domain',
            CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
              THEN 1 ELSE 0 END) AS BIGINT), count(*) FROM orders
          UNION ALL SELECT 'totalprice_positive',
            CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT),
            count(*) FROM orders
          UNION ALL SELECT 'orderkey_unique',
            (SELECT CAST(coalesce(sum(k), 0) AS BIGINT) FROM (
              SELECT count(*) AS k FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
            count(*) FROM orders
          UNION ALL SELECT 'custkey_references_customer',
            (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_custkey IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
            count(*) FROM orders)
        SELECT check_name, n_violations, n_rows, n_violations = 0 AS passed
        FROM rep ORDER BY check_name""")),

    QueryDef("op_rolling",
      // sliding-frame moving average per user: the rolling sum is a
      // DECIMAL sum cast back to double because sliding engines add the
      // frame in different orders (DuckDB segment tree vs Spark
      // add/retract) — decimal is the only representation where that
      // difference is invisible; (ts_us, event_id) totally orders the key
      (s, d) => Analytics.rollingStats(
          eventsUs(s, d).select(col("event_id"), col("user_id"), col("ts_us"), col("value")),
          col("user_id"), Seq(col("ts_us"), col("event_id")), col("value"), 3)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("roll_sum"), col("roll_n"), col("roll_avg"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id")),
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS roll_sum,
          count(value) OVER w AS roll_n,
          CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE)
            / CAST(count(value) OVER w AS DOUBLE) AS roll_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id""")),

    QueryDef("op_ewma",
      // dyadic EWMA (α = 1/2, 16-term truncation): exponential smoothing
      // whose weighted numerator is PURE BIGINT — values pre-scale with
      // floor(v·1000) (floor, not cast: double→long casts truncate in
      // Spark but round in DuckDB), weights are powers of two, so the
      // smoothed series is exact to the last bit with one deterministic
      // double division at the end. One window sort per user; the 16-lag
      // chain reads the same frame — no self-joins, no decimal-precision
      // cliffs (see Analytics.dyadicEwma)
      (s, d) => {
        val ev = eventsUs(s, d).select(col("user_id"), col("event_id"), col("ts_us"),
          floor(col("value") * 1000).cast("long").as("v_milli"))
        Analytics.dyadicEwma(ev, col("user_id"), Seq(col("ts_us"), col("event_id")),
            col("v_milli"), terms = 16, scaleDiv = 1000.0)
          .select(col("user_id"), col("event_id"), col("ts_us"), col("v_milli"),
            col("ewma_num"), col("ewma"))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some(ewmaOracleSql(16))),

    QueryDef("op_rank_normalize",
      // percent-rank normalization (the rank-gauss / quantile-transform
      // first stage): per-source percent_rank of document length under a
      // TOTAL order (n_chars, doc_id — no ties, so the rank and the one
      // (rank−1)/(n−1) double division are engine-identical rationals).
      // One window shuffle on the group key; output is the per-doc
      // normalized feature
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("pr", percent_rank().over(w))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""SELECT doc_id, source, n_chars,
          percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS pr
        FROM documents ORDER BY source, doc_id""")),

    QueryDef("op_range_window",
      // time-based RANGE frame (the other half of the sliding-window
      // surface — op_rolling's frame is a ROW count, this one is defined
      // by the VALUE of ts): per-user trailing-1-hour sum/count at each
      // event. Ties in ts share the identical frame, so no tiebreak
      // enters the frame definition and the aggregate is deterministic
      // by construction; the frame sum is DECIMAL for the same
      // evaluation-order reason as op_rolling.
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-3600L * 1000000L, 0L)
        eventsUs(s, d)
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
          .withColumn("hr_sum", sum(col("value").cast("decimal(24,6)")).over(w).cast("double"))
          .withColumn("hr_n", count(col("value")).over(w))
          .orderBy(col("user_id"), col("ts_us"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
          CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS hr_sum,
          count(value) OVER w AS hr_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us, event_id""")),

    QueryDef("op_mad_outliers",
      // robust (median/MAD) outlier stats — the heavy-tail-safe cousin of
      // op_zscore: exact rank-interpolation medians (winsorize's spillable
      // shape, no unbounded percentile buffer); l_quantity is integral so
      // every interp (halves/quarters) and the 3·MAD compare are exact in
      // both engines
      (s, d) => Analytics.madStats(
          t(s, d, "lineitem"), col("l_returnflag"), col("l_quantity"), 3.0)
        .orderBySmall(col("grp")),
      Some("""WITH v AS (SELECT l_returnflag AS grp, CAST(l_quantity AS DOUBLE) AS x
          FROM lineitem WHERE l_quantity IS NOT NULL),
        m AS (SELECT grp, quantile_cont(x, 0.5) AS med FROM v GROUP BY 1),
        d AS (SELECT v.grp AS grp, x, med, abs(x - med) AS ad FROM v JOIN m ON v.grp = m.grp),
        md AS (SELECT grp, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
        SELECT d.grp AS grp, count(*) AS n_rows, max(med) AS median, max(md.mad) AS mad,
          CAST(sum(CASE WHEN ad > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM d JOIN md ON d.grp = md.grp GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_contingency",
      // χ²/mutual-information feed: contingency cells with integer
      // marginals (expected counts derivable downstream as exact
      // rationals); one SF-scale shuffle (the cell groupBy) — the marginal
      // windows run over the ≤|A|·|B| cell table, not the fact table
      (s, d) => Analytics.contingency(
          t(s, d, "orders"), col("o_orderpriority"), col("o_orderstatus"))
        .orderBySmall(col("a"), col("b")),
      Some("""WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
            count(*) AS n_obs FROM orders GROUP BY 1, 2)
        SELECT a, b, n_obs,
          CAST(sum(n_obs) OVER (PARTITION BY a) AS BIGINT) AS row_total,
          CAST(sum(n_obs) OVER (PARTITION BY b) AS BIGINT) AS col_total,
          CAST(sum(n_obs) OVER () AS BIGINT) AS n_total
        FROM cells ORDER BY a, b""")),

    // ---- model-evaluation family (the measurement half of the quality-
    // classifier curation loop: score → AUC / operating point /
    // calibration / lift). Labels and scores are planted deterministic
    // integer constructs over doc_id (correlated: positives shift +30),
    // so every metric is analytic and the hash check pins the full
    // computation, tie handling included. ----
    QueryDef("ml_auc",
      // exact ROC AUC via Mann–Whitney midranks: integer rank algebra
      // over the per-score group table (the unpartitioned cumsum window
      // sees |score domain| ≤ 101 rows, never the corpus), one IEEE
      // division at the end
      (s, d) => {
        val f = t(s, d, "documents").select(
          ((col("doc_id") * 37) % 71 +
            when(col("doc_id") % 3 === 0, 30).otherwise(0)).as("score"),
          when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("y"))
        MlEval.aucExact(f, col("score"), col("y"))
          .orderBySmall(col("n_pos"))
      },
      Some("""WITH f AS (SELECT (doc_id*37) % 71 + CASE WHEN doc_id%3=0 THEN 30 ELSE 0 END AS s,
            CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END AS y FROM documents),
        g AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos FROM f GROUP BY 1),
        w AS (SELECT s, cnt, pos, CAST(coalesce(sum(cnt) OVER (ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below FROM g),
        a AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(cnt-pos) AS BIGINT) AS n_neg,
          CAST(sum(pos*(2*below+cnt+1)) AS BIGINT) AS r2 FROM w)
        SELECT n_pos, n_neg, r2 - n_pos*(n_pos+1) AS u2,
          CAST(r2 - n_pos*(n_pos+1) AS DOUBLE) / CAST(2*n_pos*n_neg AS DOUBLE) AS auc
        FROM a ORDER BY n_pos""")),

    QueryDef("ml_confusion",
      // confusion matrix + accuracy/precision/recall/F1 at threshold 50
      // — one aggregation, one row, each ratio a single division of
      // exact integers (F1 via the 2·tp identity: no intermediate float)
      (s, d) => {
        val f = t(s, d, "documents").select(
          ((col("doc_id") * 37) % 71 +
            when(col("doc_id") % 3 === 0, 30).otherwise(0)).as("score"),
          when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("y"))
        MlEval.confusionReport(f, col("score"), col("y"), threshold = 50L)
          .orderBySmall(col("tp"))
      },
      Some("""WITH f AS (SELECT (doc_id*37) % 71 + CASE WHEN doc_id%3=0 THEN 30 ELSE 0 END AS s,
            CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END AS y FROM documents),
        c AS (SELECT CAST(sum(CASE WHEN s>=50 AND y=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(sum(CASE WHEN s>=50 AND y=0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(sum(CASE WHEN s<50 AND y=1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          CAST(sum(CASE WHEN s<50 AND y=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn FROM f)
        SELECT tp, fp, fn, tn,
          CAST(tp+tn AS DOUBLE)/CAST(tp+fp+fn+tn AS DOUBLE) AS accuracy,
          CAST(tp AS DOUBLE)/CAST(tp+fp AS DOUBLE) AS precision_,
          CAST(tp AS DOUBLE)/CAST(tp+fn AS DOUBLE) AS recall_,
          CAST(2*tp AS DOUBLE)/CAST(2*tp+fp+fn AS DOUBLE) AS f1
        FROM c ORDER BY tp""")),

    QueryDef("ml_calibration",
      // reliability table: centi-probability p buckets into 10 bins;
      // mean predicted prob is an exact decimal sum → one division,
      // empirical rate an integer ratio. Label depends on p plus a
      // deterministic residue "noise" term so the curve is monotone but
      // not degenerate
      (s, d) => {
        val f = t(s, d, "documents").select(
          ((col("doc_id") * 13) % 100).as("p"),
          when((col("doc_id") * 13) % 100 + (col("doc_id") % 7) * 5 >= 65, 1L)
            .otherwise(0L).as("y"))
        MlEval.calibrationBins(f, col("p"), col("y"), nBins = 10)
          .orderBySmall(col("bin"))
      },
      Some("""WITH f AS (SELECT (doc_id*13) % 100 AS p,
            CASE WHEN (doc_id*13)%100 + (doc_id%7)*5 >= 65 THEN 1 ELSE 0 END AS y FROM documents)
        SELECT p//10 AS bin, count(*) AS n,
          CAST(sum(CAST(p AS DECIMAL(20,0))) AS DOUBLE)/CAST(100*count(*) AS DOUBLE) AS mean_pred,
          CAST(sum(y) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS pos_rate
        FROM f GROUP BY 1 ORDER BY 1""")),

    QueryDef("ml_lift",
      // per-source decile lift (gain chart): ntile within stratum
      // (score desc, id tiebreak — deterministic), response rate and
      // lift vs the stratum base rate; output bounded by 10·|sources|
      (s, d) => {
        val f = t(s, d, "documents").select(col("doc_id"), col("source"),
          ((col("doc_id") * 37) % 71 +
            when(col("doc_id") % 3 === 0, 30).otherwise(0)).as("score"),
          when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("y"))
        MlEval.liftDeciles(f, col("source"), col("score"), col("doc_id"), col("y"))
          .orderBySmall(col("seg"), col("decile"))
      },
      Some("""WITH f AS (SELECT doc_id, source, (doc_id*37) % 71 + CASE WHEN doc_id%3=0 THEN 30 ELSE 0 END AS s,
            CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END AS y FROM documents),
        dd AS (SELECT source AS seg, CAST(ntile(10) OVER (PARTITION BY source ORDER BY s DESC, doc_id) AS INTEGER) AS decile, y FROM f),
        g AS (SELECT seg, decile, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos FROM dd GROUP BY 1, 2),
        tt AS (SELECT seg, decile, n, n_pos, CAST(sum(n) OVER (PARTITION BY seg) AS BIGINT) AS seg_n,
          CAST(sum(n_pos) OVER (PARTITION BY seg) AS BIGINT) AS seg_pos FROM g)
        SELECT seg, decile, n, n_pos,
          CAST(n_pos AS DOUBLE)/CAST(n AS DOUBLE) AS rate,
          (CAST(n_pos AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(seg_pos AS DOUBLE)/CAST(seg_n AS DOUBLE)) AS lift
        FROM tt ORDER BY seg, decile""")),

    QueryDef("ml_feature_hash",
      // signed hashing trick (Weinberger'09): fixed-dim sparse features
      // with NO vocabulary pass — md5 bucket + independent md5 sign bit,
      // one explode + one map-side-combined agg; per-doc sparse vectors
      // for a deterministic doc sample
      (s, d) => Features.featureHash(
          t(s, d, "documents").where(col("doc_id") % 20 === 0),
          col("doc_id"), col("text"), dim = 32)
        .orderBy(col("id"), col("bucket")),
      Some("""WITH tok AS (SELECT doc_id AS id,
            unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS tok
          FROM documents WHERE doc_id % 20 = 0)
        SELECT id, ('0x' || substring(md5(tok), 1, 8))::BIGINT % 32 AS bucket,
          CAST(sum(CASE WHEN ('0x' || substring(md5(tok), 9, 1))::BIGINT % 2 = 0
            THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("ml_pca_project",
      // exact-moment PCA over an integer-lattice construct (the
      // ann_ivf_fit technique): features x1=(id%4), x2=2·((id÷4)%4),
      // x3=3·((id÷16)%4) over a ⌊N/64⌋·64-row prefix form COMPLETE
      // residue systems mod 64, so the covariance is exactly diagonal
      // with distinct eigenvalues {11.25, 5, 1.25} — the real code path
      // (one moment agg → exact BigDecimal covariance → cyclic Jacobi →
      // sign-pinned components → literal projection) produces an
      // analytic, hash-checkable answer. Header row doc_id = −1 carries
      // the top-2 eigenvalues
      (s, d) => {
        val docs = t(s, d, "documents")
        val L = (docs.count() / 64L) * 64L
        val feat = docs.where(col("doc_id") < L).select(col("doc_id"),
          (col("doc_id") % 4).cast("double").as("x1"),
          (expr("(doc_id div 4) % 4") * 2).cast("double").as("x2"),
          (expr("(doc_id div 16) % 4") * 3).cast("double").as("x3"))
        val fcols = Seq(col("x1"), col("x2"), col("x3"))
        val model = Features.pcaFit(feat, fcols)
        val pcs = Features.pcaProject(fcols, model, k = 2)
        val perDoc = feat.where(col("doc_id") % 10 === 0)
          .select(col("doc_id"), pcs(0), pcs(1))
        val header = s.range(1).select(lit(-1L).as("doc_id"),
          lit(model.eigenvalues(0)).as("pc1"), lit(model.eigenvalues(1)).as("pc2"))
        perDoc.unionByName(header).orderBy(col("doc_id"))
      },
      Some("""WITH nn AS (SELECT (count(*) // 64) * 64 AS L FROM documents),
        f AS (SELECT doc_id, CAST(doc_id % 4 AS DOUBLE) AS x1,
            CAST(((doc_id // 4) % 4) * 2 AS DOUBLE) AS x2,
            CAST(((doc_id // 16) % 4) * 3 AS DOUBLE) AS x3
          FROM documents, nn WHERE doc_id < nn.L),
        m AS (SELECT count(*) AS n,
            CAST(sum(CAST(x2 AS DECIMAL(28,6))) AS DOUBLE) AS s2,
            CAST(sum(CAST(x3 AS DECIMAL(28,6))) AS DOUBLE) AS s3,
            CAST(sum(CAST(x2*x2 AS DECIMAL(32,12))) AS DOUBLE) AS p2,
            CAST(sum(CAST(x3*x3 AS DECIMAL(32,12))) AS DOUBLE) AS p3
          FROM f),
        mm AS (SELECT s2/n AS mu2, s3/n AS mu3,
            (n*p3 - s3*s3)/(n*n) AS ev1, (n*p2 - s2*s2)/(n*n) AS ev2 FROM m)
        SELECT doc_id, x3 - mu3 AS pc1, x2 - mu2 AS pc2
        FROM f, mm WHERE doc_id % 10 = 0
        UNION ALL SELECT CAST(-1 AS BIGINT), ev1, ev2 FROM mm
        ORDER BY doc_id""")),

    QueryDef("op_attribution",
      // last-touch attribution: each purchase credits the user's most
      // recent STRICTLY-PRIOR marketing touch (view/click/signup), via
      // an ignore-nulls last() over the user timeline — one window
      // shuffle on user_id, bounded channel-count output
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val touch = when(col("event_type").isin("view", "click", "signup"),
          col("event_type"))
        eventsUs(s, d)
          .withColumn("channel",
            coalesce(last(touch, ignoreNulls = true).over(w), lit("none")))
          .where(col("event_type") === "purchase")
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_conversions"))
          .orderBySmall(col("channel"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        a AS (SELECT event_type, coalesce(last_value(CASE WHEN event_type IN ('view','click','signup')
            THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'none') AS channel FROM e)
        SELECT channel, count(*) AS n_conversions
        FROM a WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_markov",
      // first-order Markov transition matrix over per-user event
      // sequences (boilerplate/bot detection feed): (state → next) counts
      // + exact conditional probability; one lead-window shuffle on
      // user_id, ≤|states|² output cells
      (s, d) => Analytics.markovTransitions(eventsUs(s, d), col("user_id"),
          Seq(col("ts_us"), col("event_id")), col("event_type"))
        .orderBySmall(col("from_state"), col("to_state")),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
        p AS (SELECT event_type AS from_state,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_state FROM e),
        g AS (SELECT from_state, to_state, count(*) AS n FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2)
        SELECT from_state, to_state, n,
          CAST(sum(n) OVER (PARTITION BY from_state) AS BIGINT) AS row_total,
          CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_state) AS DOUBLE) AS p
        FROM g ORDER BY 1, 2""")),

    QueryDef("op_rfm",
      // RFM customer segmentation: per-customer recency (days to the
      // corpus horizon) / frequency / quantized monetary, each mapped to
      // a ties-together quartile via the aucExact group-cumsum pattern
      // (bounded distinct-value tables broadcast back — NEVER a global
      // ntile, which would single-partition the corpus), segment =
      // 100·R+10·F+M, bounded ≤64-row segment census
      (s, d) => {
        // persisted: the per-customer aggregate feeds THREE quartile maps
        // plus the final join — unpersisted it would re-run the orders
        // shuffle for every consumer (measured 6 jobs → this is the one
        // SF-scale pass; released by the harness clearCache)
        val per = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("_last"),
            count(lit(1)).as("freq"),
            dsum(col("o_totalprice"), 20, 2).as("_mon"))
          .select(col("o_custkey"),
            datediff(lit("2001-12-31").cast("date"), col("_last").cast("date"))
              .cast("long").as("rec"),
            col("freq"),
            floor(col("_mon") / lit(1000.0)).cast("long").as("monk"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def attach(df: DataFrame, c: String, q: String): DataFrame = {
          val m = Analytics.tiedQuartileMap(df, col(c))
            .select(col("v").as(s"_v_$q"), col("quartile").as(q))
          df.join(broadcast(m), col(c) === col(s"_v_$q")).drop(s"_v_$q")
        }
        val seg = attach(attach(attach(per, "rec", "r_q"), "freq", "f_q"), "monk", "m_q")
          .select((col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
        seg.groupBy(col("segment")).agg(count(lit(1)).as("n_customers"))
          .orderBySmall(col("segment"))
      },
      Some("""WITH per AS (SELECT o_custkey,
            date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-12-31') AS rec,
            count(*) AS freq,
            CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) / 1000.0) AS BIGINT) AS monk
          FROM orders GROUP BY 1),
        rg AS (SELECT rec AS v, count(*) AS c FROM per GROUP BY 1),
        rq AS (SELECT v, least(4, (4 * CAST(coalesce(sum(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) // CAST(sum(c) OVER () AS BIGINT) + 1) AS q FROM rg),
        fg AS (SELECT freq AS v, count(*) AS c FROM per GROUP BY 1),
        fq AS (SELECT v, least(4, (4 * CAST(coalesce(sum(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) // CAST(sum(c) OVER () AS BIGINT) + 1) AS q FROM fg),
        mg AS (SELECT monk AS v, count(*) AS c FROM per GROUP BY 1),
        mq AS (SELECT v, least(4, (4 * CAST(coalesce(sum(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)) // CAST(sum(c) OVER () AS BIGINT) + 1) AS q FROM mg)
        SELECT rq.q * 100 + fq.q * 10 + mq.q AS segment, count(*) AS n_customers
        FROM per JOIN rq ON per.rec = rq.v JOIN fq ON per.freq = fq.v JOIN mq ON per.monk = mq.v
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_impute",
      // group-mean null imputation, reported: nulls planted
      // deterministically (event_id % 11), per-type missing census, the
      // imputation value, and the post-imputation total assembled as
      // sum_nonnull + n_missing·mean (two deterministic double ops on
      // exact inputs — per-row imputed-double summation would be
      // partition-order-dependent)
      (s, d) => Transforms.meanImputeReport(
          t(s, d, "events").select(col("event_type"),
            when(col("event_id") % 11 === 0, lit(null).cast("double"))
              .otherwise(col("value")).as("v")),
          col("event_type"), col("v"))
        .orderBySmall(col("grp")),
      Some("""WITH e AS (SELECT event_type AS grp,
            CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS v FROM events),
        g AS (SELECT grp, count(*) AS n_rows,
            CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
            count(v) AS nv, sum(CAST(v AS DECIMAL(28,6))) AS s FROM e GROUP BY 1)
        SELECT grp, n_rows, n_missing,
          CAST(s AS DOUBLE) / CAST(nv AS DOUBLE) AS mean_used,
          CAST(s AS DOUBLE) + (CAST(s AS DOUBLE) / CAST(nv AS DOUBLE)) * CAST(n_missing AS DOUBLE) AS total_after
        FROM g ORDER BY grp""")),

    QueryDef("op_orc_roundtrip",
      // columnar-format interchange: write the projected documents table
      // as ORC (Spark-native source, predicate/pruning-capable like
      // parquet), read it back, aggregate — proves the full encode/decode
      // path; the oracle aggregates the original parquet, so any ORC
      // corruption breaks the hash
      (s, d) => {
        val dir = scratchDir("orc", d)
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").orc(dir)
        s.read.orc(dir).groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_chi_square",
      // Pearson χ² decomposition over priority×status: per-cell expected
      // count + contribution (exact long products → one square, one
      // division), statistic folded in UTF-8 cell order over the bounded
      // cell table (float addition is not associative — an unordered SUM
      // would be engine-varying), mirrored by an ordered list_reduce
      (s, d) => Analytics.chiSquare(t(s, d, "orders"),
          col("o_orderpriority"), col("o_orderstatus"))
        .orderBySmall(col("a"), col("b")),
      Some("""WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS n_obs
          FROM orders GROUP BY 1, 2),
        t AS (SELECT a, b, n_obs,
            CAST(sum(n_obs) OVER (PARTITION BY a) AS BIGINT) AS r,
            CAST(sum(n_obs) OVER (PARTITION BY b) AS BIGINT) AS c,
            CAST(sum(n_obs) OVER () AS BIGINT) AS n FROM cells),
        e AS (SELECT a, b, n_obs,
            CAST(r*c AS DOUBLE)/CAST(n AS DOUBLE) AS expected,
            CAST(n_obs*n - r*c AS DOUBLE)*CAST(n_obs*n - r*c AS DOUBLE)/CAST(n*r*c AS DOUBLE) AS contrib
          FROM t),
        tot AS (SELECT list_reduce(list(contrib ORDER BY a, b), (x, y) -> x + y) AS chi2,
            CAST((count(DISTINCT a)-1)*(count(DISTINCT b)-1) AS BIGINT) AS deg_free FROM e)
        SELECT e.a, e.b, e.n_obs, e.expected, e.contrib, tot.chi2, tot.deg_free
        FROM e, tot ORDER BY a, b""")),

    QueryDef("op_schema_drift",
      // vendor-drop acceptance check: column-level profile diff between
      // two snapshots (v1 drops a column; v2 adds a nullable one) —
      // added/removed columns surface as one-sided rows, null/distinct
      // censuses as integer deltas; one linear pass + agg per side
      (s, d) => {
        val o = t(s, d, "orders")
        val v1 = o.where(col("o_orderkey") % 2 === 0).drop("o_orderpriority")
        val v2 = o.where(col("o_orderkey") % 3 =!= 0)
          .withColumn("o_channel", when(col("o_orderkey") % 5 === 0,
            lit(null).cast("string")).otherwise(lit("web")))
        Analytics.profileDrift(v1, v2).orderBySmall(col("column_name"))
      },
      Some(profileDriftOracleSql(
        v1Cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
        v2Cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority", "o_channel")))),

    QueryDef("op_partition_pruning",
      // partition-layout interchange: write documents partitioned by
      // source (Hive-style directories), read back with a partition
      // predicate — the scan must prune to the two matching directories
      // (plan-asserted in PlanSpec); the oracle filters the original
      // parquet, so a partition-placement bug breaks the hash
      (s, d) => {
        val dir = scratchDir("part", d)
        t(s, d, "documents").write.mode("overwrite")
          .partitionBy("source").parquet(dir)
        s.read.parquet(dir)
          .where(col("source").isin("src0", "src1"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_sparse_cosine",
      // exact tf-weighted pairwise cosine ≥ 4/5 with df-capped candidate
      // generation (the multiset complement of dedup_ngram_jaccard's set
      // Jaccard): integer-only threshold compare den²·dot² ≥ num²·‖a‖²‖b‖²
      // in DECIMAL — no sqrt, no float anywhere
      (s, d) => TextAnalysis.sparseCosinePairs(t(s, d, "documents"),
          "doc_id", "text", thrNum = 4, thrDen = 5, maxDf = 10, shingleN = 3)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH tk AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        shl AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
            FOR i IN generate_series(1, len(toks) - 2)] AS shingles
          FROM tk WHERE len(toks) >= 3),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM (
            SELECT doc_id, unnest(shingles) AS tok FROM shl) GROUP BY 1, 2),
        nm AS (SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS nsq FROM tf GROUP BY 1),
        kept AS (SELECT doc_id, tok FROM (
            SELECT doc_id, tok, count(*) OVER (PARTITION BY tok) AS df FROM tf) WHERE df <= 10),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id),
        dt AS (SELECT c.doc_a, c.doc_b, CAST(sum(ta.tf * tb.tf) AS BIGINT) AS dot
          FROM cand c JOIN tf ta ON ta.doc_id = c.doc_a
          JOIN tf tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
          GROUP BY 1, 2)
        SELECT dt.doc_a, dt.doc_b, dt.dot, na.nsq AS norm_a_sq, nb.nsq AS norm_b_sq
        FROM dt JOIN nm na ON na.doc_id = dt.doc_a JOIN nm nb ON nb.doc_id = dt.doc_b
        WHERE 25 * CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT)
          >= 16 * CAST(na.nsq AS HUGEINT) * CAST(nb.nsq AS HUGEINT)
        ORDER BY doc_a, doc_b""")),

    QueryDef("op_kcore",
      // k-core decomposition (k=3) on a planted graph whose core is
      // analytic: a K6 clique (+a 3-edge pendant that SURVIVES only
      // because its own pendant peels first — the cascade the iterative
      // algorithm exists for), an 8-cycle (2-core, peels round 1), and a
      // degree-1 tail. The Spark side runs the REAL fixpoint peel; the
      // oracle unrolls two peel rounds (the construct's exact depth)
      (s, d) => {
        val ids = t(s, d, "documents").select(col("doc_id"))
          .where(col("doc_id") < 48)
        val edges = ids.select(
          when(col("doc_id") < 36, expr("doc_id div 6"))
            .when(col("doc_id") < 44, lit(100L) + (col("doc_id") - 36))
            .when(col("doc_id") < 47, col("doc_id") - 44)
            .otherwise(lit(300L)).as("src"),
          when(col("doc_id") < 36, col("doc_id") % 6)
            .when(col("doc_id") < 44, lit(100L) + ((col("doc_id") - 36 + 1) % 8))
            .when(col("doc_id") < 47, lit(300L))
            .otherwise(lit(301L)).as("dst"))
        Analytics.kCore(edges, "src", "dst", k = 3)
          .orderBySmall(col("node"))
      },
      Some("""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
        raw AS (SELECT
            CASE WHEN doc_id < 36 THEN doc_id // 6
                 WHEN doc_id < 44 THEN 100 + (doc_id - 36)
                 WHEN doc_id < 47 THEN doc_id - 44
                 ELSE 300 END AS s,
            CASE WHEN doc_id < 36 THEN doc_id % 6
                 WHEN doc_id < 44 THEN 100 + ((doc_id - 36 + 1) % 8)
                 WHEN doc_id < 47 THEN 300
                 ELSE 301 END AS t
          FROM ids),
        e0 AS (SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b FROM raw WHERE s <> t),
        d1 AS (SELECT node, count(*) AS deg FROM
          (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        k1 AS (SELECT node FROM d1 WHERE deg >= 3),
        e1 AS (SELECT e0.a, e0.b FROM e0 JOIN k1 x ON e0.a = x.node JOIN k1 y ON e0.b = y.node),
        d2 AS (SELECT node, count(*) AS deg FROM
          (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
        k2 AS (SELECT node FROM d2 WHERE deg >= 3),
        e2 AS (SELECT e1.a, e1.b FROM e1 JOIN k2 x ON e1.a = x.node JOIN k2 y ON e1.b = y.node)
        SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
          (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2)
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_survivorship",
      // MDM golden-record merge: per customer each attribute survives
      // from its most recent NON-NULL row (a fresher row with a null
      // attribute must not erase an older value — statuses null out on
      // a planted rule to force the skip), via max(struct(recency,
      // value)) in ONE aggregation — no window, no join
      (s, d) => {
        val o = t(s, d, "orders").withColumn("status2",
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        Aggregates.goldenRecord(o, col("o_custkey"),
          recency = Seq(col("o_orderdate"), col("o_orderkey")),
          payload = Seq("latest_status" -> col("status2"),
            "latest_price" -> col("o_totalprice")),
          extra = Seq(count(lit(1)).as("n_orders"),
            unix_micros(min(col("o_orderdate")).cast("timestamp")).as("first_date_us")))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH o AS (SELECT *, CASE WHEN o_orderkey % 7 = 0 THEN NULL
            ELSE o_orderstatus END AS status2 FROM orders),
        st AS (SELECT o_custkey, status2 AS latest_status FROM o WHERE status2 IS NOT NULL
          QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
        pr AS (SELECT o_custkey, o_totalprice AS latest_price FROM o WHERE o_totalprice IS NOT NULL
          QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
        ag AS (SELECT o_custkey, count(*) AS n_orders, epoch_us(min(o_orderdate)) AS first_date_us
          FROM o GROUP BY 1)
        SELECT ag.o_custkey, st.latest_status, pr.latest_price, ag.n_orders, ag.first_date_us
        FROM ag LEFT JOIN st USING (o_custkey) LEFT JOIN pr USING (o_custkey)
        ORDER BY o_custkey""")),

    // ---- TPC-H-shaped relational additions (q7/q12/q16/q22 analogs on
    // the driver schema — no partsupp/shipmode/phone columns, so each
    // keeps its original JOIN/AGG SHAPE with the available columns) ----
    QueryDef("q7_nation_volume",
      // q7: revenue volume between two specific nations by ship year —
      // the 5-way join with a symmetric nation-pair predicate; growing
      // tables sort-merge, the 25-row nation dim broadcasts twice
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val su = t(s, d, "supplier")
        val n1 = t(s, d, "nation").select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation").select(col("n_nationkey").as("_cnk"), col("n_name").as("cust_nation"))
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(su.hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("_snk"))
          .join(broadcast(n2), col("c_nationkey") === col("_cnk"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate").cast("date")).cast("long").as("l_year"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBySmall(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue, count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    QueryDef("q12_late_shipments",
      // q12's shape (lineitem⋈orders, conditional priority counts) with
      // lateness = shipped >90 days after order date standing in for the
      // missing commit/receipt dates; integer day arithmetic
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val late = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")) > 90
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(late.as("is_late"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
          .orderBySmall(col("is_late"))
      },
      Some("""SELECT date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 AS is_late,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q16_supplier_reach",
      // q16's shape without partsupp: supplier reach per (brand, size
      // band) derived from SHIPPED pairs (distinct l_partkey×l_suppkey),
      // excluding negative-balance suppliers via anti join — distinct
      // count + NOT-IN-as-anti-join
      (s, d) => {
        val ps = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = t(s, d, "supplier").where(col("s_acctbal") < 0)
          .select(col("s_suppkey").as("_bad"))
        val p = t(s, d, "part")
        ps.join(bad.hint("merge"), col("l_suppkey") === col("_bad"), "left_anti")
          .join(p.hint("merge"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), (col("p_size") / lit(10)).cast("long").as("size_band"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
            countDistinct(col("l_partkey")).as("part_cnt"))
          .orderBySmall(col("p_brand"), col("size_band"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        ok AS (SELECT ps.l_partkey, ps.l_suppkey FROM ps
          WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = ps.l_suppkey AND s_acctbal < 0))
        SELECT p_brand, CAST(p_size // 10 AS BIGINT) AS size_band,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
          CAST(count(DISTINCT l_partkey) AS BIGINT) AS part_cnt
        FROM ok JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q22_dormant_value",
      // q22's shape: above-average-balance customers with NO orders
      // (scalar avg subquery → anti join), grouped by nation band;
      // the avg is a decimal-exact sum → one division, and the balance
      // compare runs against that single scalar
      (s, d) => {
        val c = t(s, d, "customer")
        val avgBal = c.where(col("c_acctbal") > 0)
          .agg((dsum(col("c_acctbal"), 20, 2).cast("double") /
            count(lit(1)).cast("double")).as("_avg"))
        // dormant = no orders in the trailing window (every synthetic
        // customer has SOME order, so the classic no-orders-ever form
        // would return an empty — trivially matching — result)
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1999-01-01 00:00:00'"))
          .select(col("o_custkey")).distinct()
        c.crossJoin(broadcast(avgBal))
          .where(col("c_acctbal") > col("_avg"))
          .join(o.hint("merge"), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy((col("c_nationkey") % 10).as("nation_band"))
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 20, 2).as("totacctbal"))
          .orderBySmall(col("nation_band"))
      },
      Some(s"""WITH a AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bal
          FROM customer WHERE c_acctbal > 0)
        SELECT c_nationkey % 10 AS nation_band, count(*) AS numcust,
          ${dsumSql("c_acctbal", 20, 2)} AS totacctbal
        FROM customer, a
        WHERE c_acctbal > a.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_jdbc_roundtrip",
      // relational-store interchange: write the projected documents table
      // into a relational database over JDBC, read it back as a
      // PARTITIONED JDBC scan (4 range partitions on doc_id — the
      // parallel-ingest shape for production databases), aggregate; the
      // oracle aggregates the original parquet, so a JDBC type-mapping
      // or partition-boundary bug breaks the hash. The endpoint is
      // ENV-GATED: set SPARK_GRAFT_JDBC_URL (e.g.
      // "jdbc:postgresql://host/db") + SPARK_GRAFT_JDBC_DRIVER [+
      // SPARK_GRAFT_JDBC_USER / SPARK_GRAFT_JDBC_PASSWORD] to run the
      // SAME key against a real server (the reference serves from
      // postgres:13 — /root/reference/docker-compose.yaml); the default
      // is embedded Derby, which needs no server in this sandbox.
      (s, d) => {
        val dir = scratchDir("jdbc", d)
        val url = sys.env.getOrElse("SPARK_GRAFT_JDBC_URL",
          s"jdbc:derby:$dir/db;create=true")
        val driver = sys.env.getOrElse("SPARK_GRAFT_JDBC_DRIVER",
          "org.apache.derby.jdbc.EmbeddedDriver")
        val props = new java.util.Properties()
        props.setProperty("driver", driver)
        sys.env.get("SPARK_GRAFT_JDBC_USER").foreach(props.setProperty("user", _))
        sys.env.get("SPARK_GRAFT_JDBC_PASSWORD").foreach(props.setProperty("password", _))
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").jdbc(url, "docs", props)
        val maxId = t(s, d, "documents").agg(max(col("doc_id"))).head().getLong(0)
        val reader = s.read.format("jdbc")
          .option("url", url).option("dbtable", "docs")
          .option("driver", driver)
        sys.env.get("SPARK_GRAFT_JDBC_USER")
          .foreach(u => reader.option("user", u))
        sys.env.get("SPARK_GRAFT_JDBC_PASSWORD")
          .foreach(pw => reader.option("password", pw))
        reader
          .option("partitionColumn", "doc_id")
          .option("lowerBound", 0L).option("upperBound", math.max(maxId, 1L))
          .option("numPartitions", 4)
          .load()
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_attribution_linear",
      // linear (equal-split) multi-touch attribution: each purchase
      // splits one unit of credit equally across ALL its strictly-prior
      // touches, in INTEGER MILLIONTHS (10⁶ div n per touch, remainder
      // to the most recent touch — totals stay exact integers; decimal
      // division scales differ across engines, integer credit does not).
      // Running per-channel touch counts + the last-touch channel come
      // from one user-timeline window pass; per-channel totals follow
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        def touches(ch: String) =
          sum(when(col("event_type") === ch, 1L).otherwise(0L)).over(w)
        val lastTouch = last(when(col("event_type").isin("view", "click", "signup"),
          col("event_type")), ignoreNulls = true).over(w)
        val purchases = eventsUs(s, d)
          .select(col("event_id"), col("event_type"),
            touches("view").as("_tv"), touches("click").as("_tc"),
            touches("signup").as("_ts"), lastTouch.as("_last"))
          .where(col("event_type") === "purchase")
          .withColumn("_n", col("_tv") + col("_tc") + col("_ts"))
          .where(col("_n") > 0)
          .withColumn("_base", expr("1000000 div _n"))
          .withColumn("_rem", expr("1000000 % _n"))
        val credits = Seq("view" -> "_tv", "click" -> "_tc", "signup" -> "_ts")
          .map { case (ch, cnt) =>
            purchases.select(lit(ch).as("channel"),
              (col(cnt) * col("_base") +
                when(col("_last") === ch, col("_rem")).otherwise(0L))
                .as("_credit"))
          }.reduce(_.unionByName(_))
        credits.groupBy(col("channel"))
          .agg(sum(col("_credit")).as("credit_millionths"))
          .orderBySmall(col("channel"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        p AS (SELECT event_id, event_type,
            CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              OVER w, 0) AS BIGINT) AS tv,
            CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              OVER w, 0) AS BIGINT) AS tc,
            CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              OVER w, 0) AS BIGINT) AS tsg,
            last_value(CASE WHEN event_type IN ('view','click','signup') THEN event_type END IGNORE NULLS)
              OVER w AS lastt
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        pp AS (SELECT *, tv + tc + tsg AS n, 1000000 // (tv + tc + tsg) AS base,
            1000000 % (tv + tc + tsg) AS rem
          FROM p WHERE event_type = 'purchase' AND tv + tc + tsg > 0),
        cr AS (
          SELECT 'view' AS channel, tv * base + CASE WHEN lastt = 'view' THEN rem ELSE 0 END AS credit FROM pp
          UNION ALL
          SELECT 'click', tc * base + CASE WHEN lastt = 'click' THEN rem ELSE 0 END FROM pp
          UNION ALL
          SELECT 'signup', tsg * base + CASE WHEN lastt = 'signup' THEN rem ELSE 0 END FROM pp)
        SELECT channel, CAST(sum(credit) AS BIGINT) AS credit_millionths
        FROM cr GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_asof_nearest",
      // nearest-event alignment (sensor-fusion shape): each purchase
      // aligns to its temporally NEAREST signup in EITHER direction
      // (strictly prior or strictly after, |Δ| tie → the earlier one) —
      // two frames of one user-timeline window pass, no join
      (s, d) => {
        val base = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val wPrior = base.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val wAfter = base.rowsBetween(1,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val sigTs = when(col("event_type") === "signup", col("ts_us"))
        eventsUs(s, d)
          .select(col("event_id"), col("event_type"), col("ts_us"),
            last(sigTs, ignoreNulls = true).over(wPrior).as("_prior"),
            first(sigTs, ignoreNulls = true).over(wAfter).as("_after"))
          .where(col("event_type") === "purchase")
          .withColumn("nearest_signup_us",
            when(col("_prior").isNull, col("_after"))
              .when(col("_after").isNull, col("_prior"))
              .when(col("ts_us") - col("_prior") <= col("_after") - col("ts_us"),
                col("_prior"))
              .otherwise(col("_after")))
          .select(col("event_id"), col("nearest_signup_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        x AS (SELECT event_id, event_type, ts_us,
            last_value(CASE WHEN event_type = 'signup' THEN ts_us END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior,
            first_value(CASE WHEN event_type = 'signup' THEN ts_us END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS after_
          FROM e)
        SELECT event_id,
          CASE WHEN prior IS NULL THEN after_
               WHEN after_ IS NULL THEN prior
               WHEN ts_us - prior <= after_ - ts_us THEN prior
               ELSE after_ END AS nearest_signup_us
        FROM x WHERE event_type = 'purchase' ORDER BY event_id""")),

    QueryDef("op_compaction",
      // OPTIMIZE-style small-file compaction through the ACID commit
      // protocol: five appends leave five data dirs; compact() rewrites
      // them as ONE committed dir. The result pins the dir counts before
      // and after AND the full content (the oracle recomputes it
      // relationally — compaction must be invisible in the data)
      (s, d) => {
        val tmpDir = System.getProperty("java.io.tmpdir")
        val prefix = "graft_compact_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getName != rp.getName)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true))
        fs.delete(rp, true)
        val mt = ManifestTable(s, root)
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
        for (i <- 0 until 5)
          mt.append(docs.where(col("doc_id") % 5 === i))
        val dirsBefore = mt.dirCount()
        mt.compact(numFiles = 1)
        val dirsAfter = mt.dirCount()
        mt.snapshot()
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("dirs_before", lit(dirsBefore.toLong))
          .withColumn("dirs_after", lit(dirsAfter.toLong))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(5 AS BIGINT) AS dirs_before, CAST(1 AS BIGINT) AS dirs_after
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_window_funnel",
      // ClickHouse-style windowFunnel (view→click→purchase within 24 h
      // of the chain's FIRST event), exact via pure window algebra on
      // the user timeline — no self-joins; result is the depth census
      (s, d) => Analytics.windowFunnel3(eventsUs(s, d), col("user_id"),
          col("ts_us"), col("event_id"), col("event_type"),
          "view", "click", "purchase", windowUs = 86400L * 1000000L)
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBySmall(col("depth")),
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        x AS (SELECT user_id, event_type, ts_us,
            last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vbest
          FROM e),
        y AS (SELECT user_id, event_type, ts_us,
            CASE WHEN event_type = 'click' AND vbest >= ts_us - 86400000000 THEN vbest END AS vok
          FROM x),
        z AS (SELECT user_id, event_type, ts_us, vok,
            max(vok) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anchor
          FROM y),
        per AS (SELECT user_id,
            max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS d1,
            max(CASE WHEN vok IS NOT NULL THEN 1 ELSE 0 END) AS d2,
            max(CASE WHEN event_type = 'purchase' AND anchor >= ts_us - 86400000000
              THEN 1 ELSE 0 END) AS d3
          FROM z GROUP BY 1)
        SELECT CAST(d1 + d1*d2 + d1*d2*d3 AS BIGINT) AS depth, count(*) AS n_users
        FROM per GROUP BY 1 ORDER BY 1""")),

    QueryDef("ml_decision_stump",
      // exact 1-rule learner: argmin-error (feature, threshold,
      // polarity) over integer features with a planted noisy rule —
      // per-feature integer error curves from the group-cumsum pattern,
      // global argmin as a bounded TakeOrdered; the ENTIRE fit is the
      // hash-checked answer
      (s, d) => {
        val f = t(s, d, "documents").select(
          (col("doc_id") % 17).cast("long").as("f1"),
          (col("doc_id") % 23).cast("long").as("f2"),
          when((col("doc_id") % 17 >= 9) =!= (col("doc_id") % 31 === 0), 1L)
            .otherwise(0L).as("y"))
        Analytics.decisionStumpFit(f,
          Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"))
      },
      Some("""WITH f AS (SELECT doc_id % 17 AS f1, doc_id % 23 AS f2,
            CASE WHEN (doc_id % 17 >= 9) <> (doc_id % 31 = 0) THEN 1 ELSE 0 END AS y
          FROM documents),
        g1 AS (SELECT f1 AS v, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos FROM f GROUP BY 1),
        w1 AS (SELECT v, CAST(coalesce(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS posBelow,
            CAST(coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cntBelow,
            CAST(sum(pos) OVER () AS BIGINT) AS posTot, CAST(sum(cnt) OVER () AS BIGINT) AS n FROM g1),
        e1 AS (SELECT 'f1' AS feature, v AS threshold, n,
            posBelow + ((n - cntBelow) - (posTot - posBelow)) AS errGe FROM w1),
        g2 AS (SELECT f2 AS v, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos FROM f GROUP BY 1),
        w2 AS (SELECT v, CAST(coalesce(sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS posBelow,
            CAST(coalesce(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cntBelow,
            CAST(sum(pos) OVER () AS BIGINT) AS posTot, CAST(sum(cnt) OVER () AS BIGINT) AS n FROM g2),
        e2 AS (SELECT 'f2' AS feature, v AS threshold, n,
            posBelow + ((n - cntBelow) - (posTot - posBelow)) AS errGe FROM w2),
        u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2),
        p AS (SELECT feature, threshold, 'ge' AS polarity, errGe AS err, n AS n_rows FROM u
          UNION ALL SELECT feature, threshold, 'lt', n - errGe, n FROM u)
        SELECT feature, threshold, polarity, err, n_rows FROM p
        ORDER BY err, feature, threshold, polarity LIMIT 1""")),

    QueryDef("op_seasonal_anomaly",
      // hour-of-day seasonal baseline with EXACT |v−μ|>2σ flags: values
      // floor-scale to millionths (the op_ewma convention), the z-test
      // cross-multiplies to pure integers (n·v−s)² > k²(n·ss−s²) in
      // DECIMAL — zero float in any flag decision; per-hour census out
      (s, d) => {
        val ev = eventsUs(s, d).select(
          expr("(ts_us div 3600000000) % 24").as("hour"),
          floor(col("value") * 1000000).cast("long").as("v_micro"))
        Analytics.seasonalAnomaly(ev, col("hour"), col("v_micro"), k = 2)
          .orderBySmall(col("season"))
      },
      Some("""WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
            CAST(floor(value * 1000000) AS BIGINT) AS v FROM events),
        m AS (SELECT hour, count(v) AS n, sum(CAST(v AS DECIMAL(28,0))) AS s,
            sum(CAST(CAST(v AS HUGEINT) * v AS DECIMAL(38,0))) AS ss
          FROM e GROUP BY 1)
        SELECT e.hour AS season, count(*) AS n_rows,
          CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE) AS season_mean,
          CAST(sum(CASE WHEN
              (CAST(m.n AS HUGEINT) * e.v - CAST(m.s AS HUGEINT)) *
              (CAST(m.n AS HUGEINT) * e.v - CAST(m.s AS HUGEINT))
              > 4 * (CAST(m.n AS HUGEINT) * CAST(m.ss AS HUGEINT)
                     - CAST(m.s AS HUGEINT) * CAST(m.s AS HUGEINT))
            THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        FROM e JOIN m ON e.hour = m.hour
        GROUP BY 1, 3 ORDER BY 1""")),

    QueryDef("op_json_roundtrip",
      // JSON-lines FILE source (distinct from op14's to_json/from_json
      // column codecs): write the projected documents table as JSON
      // files, read it back through schema inference, aggregate — pins
      // the full serializer/parser/inference path against the parquet
      // truth
      (s, d) => {
        val dir = scratchDir("json", d)
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars"))
          .write.mode("overwrite").json(dir)
        s.read.json(dir)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("mm_exif_meta",
      // REAL EXIF/TIFF parse (JEITA CP-3451 layout) through the
      // construct-and-check gate: per-doc JPEG+APP1 payloads built from
      // analytic fields in BOTH byte orders (II for even ids, MM for
      // odd — real camera files use both), walked by the real segment/
      // IFD parser; the oracle states the planted fields directly
      (s, d) => {
        import s.implicits._
        val withPayload = t(s, d, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions(_.map { id =>
            (id, Multimodal.exifSampleBytes(
              "CAM_" + (id % 5), (id % 8 + 1).toInt,
              (100 + id % 50).toInt, 200 + id % 30, id % 2 == 0))
          }).toDF("doc_id", "payload")
        Multimodal.exifMeta(withPayload, "doc_id").orderBy(col("id"))
      },
      Some("""SELECT doc_id AS id, TRUE AS ok,
          CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS endian,
          CAST(4 AS INTEGER) AS n_entries,
          'CAM_' || CAST(doc_id % 5 AS VARCHAR) AS make,
          CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
          100 + doc_id % 50 AS width, 200 + doc_id % 30 AS height
        FROM documents ORDER BY id""")),

    QueryDef("ml_naive_bayes",
      // exact categorical Naive Bayes (Laplace α=1): posterior argmax
      // cross-multiplied to pure integers, decided per (v1,v2) CELL on
      // the driver in BigInteger and folded into a literal CASE chain —
      // the whole fit AND every prediction are hash-checked via the
      // confusion matrix
      (s, d) => {
        val f = t(s, d, "documents").select(
          (col("doc_id") % 5).cast("long").as("f1"),
          (col("doc_id") % 7).cast("long").as("f2"),
          // monotone-plus-noise rule: NB's marginal factorization can
          // actually learn it (an XOR-style parity label degenerates NB
          // to the majority class — a 2-cell confusion pins far less)
          when(col("doc_id") % 5 * 2 + col("doc_id") % 7 +
              when(col("doc_id") % 11 === 0, 3).otherwise(0) >= 7, 1)
            .otherwise(0).as("y"))
        Analytics.naiveBayes2Classify(f, col("f1"), col("f2"), col("y"))
          .groupBy(col("y").as("label"), col("nb_pred"))
          .agg(count(lit(1)).as("n"))
          .orderBySmall(col("label"), col("nb_pred"))
      },
      Some("""WITH f AS (SELECT doc_id % 5 AS f1, doc_id % 7 AS f2,
            CASE WHEN doc_id % 5 * 2 + doc_id % 7 +
              CASE WHEN doc_id % 11 = 0 THEN 3 ELSE 0 END >= 7 THEN 1 ELSE 0 END AS y
          FROM documents),
        cls AS (SELECT CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n0,
            CAST(sum(y) AS HUGEINT) AS n1,
            CAST(count(DISTINCT f1) AS HUGEINT) AS v1,
            CAST(count(DISTINCT f2) AS HUGEINT) AS v2 FROM f),
        c1 AS (SELECT f1 AS v, y, CAST(count(*) AS HUGEINT) AS c FROM f GROUP BY 1, 2),
        c2 AS (SELECT f2 AS v, y, CAST(count(*) AS HUGEINT) AS c FROM f GROUP BY 1, 2),
        cells AS (SELECT a.v AS v1v, b.v AS v2v,
            CASE WHEN cls.n1 * (coalesce(a1.c, 0) + 1) * (coalesce(b1.c, 0) + 1)
                   * (cls.n0 + cls.v1) * (cls.n0 + cls.v2)
                 > cls.n0 * (coalesce(a0.c, 0) + 1) * (coalesce(b0.c, 0) + 1)
                   * (cls.n1 + cls.v1) * (cls.n1 + cls.v2)
              THEN 1 ELSE 0 END AS pred
          FROM (SELECT DISTINCT f1 AS v FROM f) a
          CROSS JOIN (SELECT DISTINCT f2 AS v FROM f) b
          CROSS JOIN cls
          LEFT JOIN c1 a1 ON a1.v = a.v AND a1.y = 1
          LEFT JOIN c1 a0 ON a0.v = a.v AND a0.y = 0
          LEFT JOIN c2 b1 ON b1.v = b.v AND b1.y = 1
          LEFT JOIN c2 b0 ON b0.v = b.v AND b0.y = 0)
        SELECT f.y AS label, CAST(cells.pred AS INTEGER) AS nb_pred, count(*) AS n
        FROM f JOIN cells ON f.f1 = cells.v1v AND f.f2 = cells.v2v
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_csv_multiline",
      // quoted-multiline CSV roundtrip: text fields carrying EMBEDDED
      // NEWLINES and quotes (planted via construct) survive write →
      // multiLine read — the parser path op04's permissive scan never
      // exercises (a naive line-splitting reader breaks exactly here)
      (s, d) => {
        val dir = scratchDir("csvml", d)
        val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
          concat(lit("line1 \"q\" of "), col("doc_id"), lit("\nline2 of "),
            col("doc_id")).as("note"))
        docs.write.mode("overwrite").option("header", "true")
          .option("quoteAll", "true").csv(dir)
        s.read.option("header", "true").option("multiLine", "true")
          .option("inferSchema", "true").csv(dir)
          .select(col("doc_id").cast("long"), col("source"), col("note"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("note")).cast("long")).as("sum_note_chars"),
            sum(when(col("note").contains("\nline2"), 1L).otherwise(0L))
              .as("n_multiline"))
          .orderBySmall(col("source"))
      },
      Some("""WITH c AS (SELECT doc_id, source,
            'line1 "q" of ' || CAST(doc_id AS VARCHAR) || chr(10) || 'line2 of ' || CAST(doc_id AS VARCHAR) AS note
          FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(len(note)) AS BIGINT) AS sum_note_chars,
          CAST(sum(CASE WHEN note LIKE '%' || chr(10) || 'line2%' THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline
        FROM c GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_binary_file_source",
      // binaryFile source (the multimodal ingest surface: each file one
      // row with its bytes): text-sink the corpus, read the files back
      // as raw bytes, pin the TOTAL byte count (per-doc UTF-8 length +
      // one newline per row — file/partition layout is nondeterministic,
      // totals are not)
      (s, d) => {
        val dir = scratchDir("binf", d)
        t(s, d, "documents").select(col("text")).write.mode("overwrite").text(dir)
        s.read.format("binaryFile").load(dir)
          .where(col("path").endsWith(".txt"))
          .agg(sum(octet_length(col("content")).cast("long")).as("total_bytes"))
          .orderBySmall(col("total_bytes"))
      },
      Some("""SELECT CAST(sum(octet_length(CAST(text AS BLOB)) + 1) AS BIGINT) AS total_bytes
        FROM documents ORDER BY total_bytes""")),

    QueryDef("q8_market_share",
      // q8 analog (national market share): NATION_1 suppliers' share of
      // regional revenue by order year — nested agg over the 5-way join,
      // share = one division of decimal-exact sums
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val su = t(s, d, "supplier")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(su.hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n.select(col("n_nationkey").as("_snk"), col("n_name").as("_sn"))),
            col("s_nationkey") === col("_snk"))
          .join(broadcast(n.select(col("n_nationkey").as("_cnk"), col("n_regionkey").as("_crk"))),
            col("c_nationkey") === col("_cnk"))
          .join(broadcast(r), col("_crk") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .groupBy(year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
          .agg(dsum(when(col("_sn") === "NATION_1", rev).otherwise(lit(0.0))).as("nation_rev"),
            dsum(rev).as("total_rev"))
          .withColumn("mkt_share",
            col("nation_rev").cast("double") / col("total_rev").cast("double"))
          .orderBySmall(col("o_year"))
      },
      Some(s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
          ${dsumSql("CASE WHEN n1.n_name = 'NATION_1' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS nation_rev,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_rev,
          CAST(${dsumSql("CASE WHEN n1.n_name = 'NATION_1' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS DOUBLE)
            / CAST(${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS DOUBLE) AS mkt_share
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("q9_profit",
      // q9 analog (product-line profit by supplier nation and year):
      // profit = revenue − retailprice·quantity standing in for the
      // missing ps_supplycost; 4-way join + nation broadcast
      (s, d) => {
        val l = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val su = t(s, d, "supplier")
        val p = t(s, d, "part")
        val n = t(s, d, "nation")
        val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.01)
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .join(su.hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .join(p.hint("merge"), col("l_partkey") === col("p_partkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
          .agg(dsum(profit).as("sum_profit"), count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year"))
      },
      Some(s"""SELECT n_name AS nation, CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
          ${dsumSql("l_extendedprice * (1.0 - l_discount) - p_retailprice * l_quantity * 0.01")} AS sum_profit,
          count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("q13_order_dist",
      // q13 (customer order-count distribution): LEFT join keeps
      // zero-order customers; the outer histogram groups the per-customer
      // counts — the classic two-level aggregation
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o.hint("merge"), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBySmall(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY 1)
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    QueryDef("q15_top_supplier",
      // q15 (top supplier): revenue view + scalar-max subquery — every
      // supplier achieving the maximum quarter revenue (ties kept, like
      // the spec); max broadcasts as a 1-row cross join
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("_mx"))
        // the max-achieving rev rows are the TINY side — broadcast THEM
        // into the SF-growing supplier table, never the reverse
        val top = rev.crossJoin(broadcast(mx))
          .where(col("total_revenue") === col("_mx"))
        t(s, d, "supplier")
          .join(broadcast(top), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBySmall(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (SELECT l_suppkey,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    QueryDef("q2_min_cost_supplier",
      // q2 analog (min-cost supplier per part, region-restricted): the
      // "supply" relation is derived from shipped lineitems (no partsupp
      // in the driver schema) — per (part, EUROPE supplier) min offer
      // price, then the correlated-min decorrelated as an aggregate
      // self-join (supply ⋈ per-part min on equality, ties kept like the
      // spec); dims broadcast, SF-growing sides sort-merge
      (s, d) => {
        val eur = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val supply = t(s, d, "lineitem")
          .join(eur.select(col("s_suppkey").as("_esk")).hint("merge"),
            col("l_suppkey") === col("_esk"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice")).as("min_cost"))
        val pmin = supply.groupBy(col("l_partkey").as("_pk"))
          .agg(min(col("min_cost")).as("_pmin"))
        supply
          .join(pmin.hint("merge"),
            col("l_partkey") === col("_pk") && col("min_cost") === col("_pmin"))
          .join(t(s, d, "part").where(col("p_size") === 15)
            .select(col("p_partkey"), col("p_name")).hint("merge"),
            col("l_partkey") === col("p_partkey"))
          .join(eur.hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
            col("n_name").as("nation"), col("min_cost"))
          .orderBy(col("p_partkey"), col("s_suppkey"))
      },
      Some("""WITH eur AS (SELECT s_suppkey, s_name, n_name FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
          supply AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_cost
            FROM lineitem JOIN eur ON l_suppkey = s_suppkey GROUP BY 1, 2),
          pmin AS (SELECT l_partkey, min(min_cost) AS pmin FROM supply GROUP BY 1)
        SELECT p_partkey, p_name, s_suppkey, s_name, n_name AS nation, supply.min_cost
        FROM part JOIN supply ON p_partkey = supply.l_partkey
        JOIN pmin ON pmin.l_partkey = supply.l_partkey AND supply.min_cost = pmin.pmin
        JOIN eur ON s_suppkey = supply.l_suppkey
        WHERE p_size = 15
        ORDER BY p_partkey, s_suppkey""")),

    QueryDef("q11_important_parts",
      // q11 analog (important stock): per-part shipped value restricted
      // to three nations' suppliers, kept where value > total/1000 — the
      // HAVING-vs-scalar-fraction shape. The compare stays in DECIMAL
      // (value·1000 > total, cross-multiplied — no float until the
      // output cast), so the cut is exact and order-independent
      (s, d) => {
        val v = t(s, d, "lineitem")
          .join(t(s, d, "supplier").hint("merge"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .where(col("n_name").isin("NATION_7", "NATION_12", "NATION_19"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(24,6)")).as("vd"))
        val tot = v.agg(sum(col("vd")).as("_total"))
        v.crossJoin(broadcast(tot))
          .where(col("vd").cast("decimal(30,6)") * lit(1000) > col("_total"))
          .select(col("l_partkey").as("p_partkey"),
            col("vd").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("p_partkey"))
      },
      Some("""WITH val AS (SELECT l_partkey,
            sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS vd
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name IN ('NATION_7', 'NATION_12', 'NATION_19') GROUP BY 1),
        tot AS (SELECT sum(vd) AS total FROM val)
        SELECT l_partkey AS p_partkey, CAST(vd AS DOUBLE) AS part_value
        FROM val, tot WHERE CAST(vd AS DECIMAL(30,6)) * 1000 > total
        ORDER BY part_value DESC, p_partkey""")),

    QueryDef("q17_small_qty_revenue",
      // q17 analog (small-quantity-order revenue): lineitems of one brand
      // whose quantity is below 0.2× that part's average — the correlated
      // per-part avg decorrelated as an aggregate join, the compare
      // cross-multiplied to 5·qty·n < sum_qty in DECIMAL (never a float
      // avg); revenue/7 is ONE final IEEE division of an exact sum
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "part").where(col("p_brand") === "Brand#23")
            .select(col("p_partkey")).hint("merge"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            col("l_quantity").cast("decimal(20,6)").as("qd"), col("l_extendedprice"))
        val pa = li.groupBy(col("l_partkey").as("_pk"))
          .agg(sum(col("qd")).as("_sum_qty"), count(lit(1)).as("_n"))
        li.join(pa.hint("merge"), col("l_partkey") === col("_pk"))
          .where(col("qd") * lit(5) * col("_n").cast("decimal(12,0)") < col("_sum_qty"))
          .agg(
            (dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
          .select(lit("Brand#23").as("p_brand"), col("avg_yearly"), col("n_lines"))
          .orderBySmall(col("p_brand"))
      },
      Some(s"""WITH li AS (SELECT l_partkey, CAST(l_quantity AS DECIMAL(20,6)) AS qd,
            l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#23'),
        pa AS (SELECT l_partkey, sum(qd) AS sum_qty, count(*) AS n FROM li GROUP BY 1)
        SELECT 'Brand#23' AS p_brand,
          ${dsumSql("li.l_extendedprice")} / 7.0 AS avg_yearly,
          count(*) AS n_lines
        FROM li JOIN pa ON li.l_partkey = pa.l_partkey
        WHERE li.qd * 5 * CAST(pa.n AS DECIMAL(12,0)) < pa.sum_qty
        ORDER BY p_brand""")),

    QueryDef("q20_excess_suppliers",
      // q20 analog (suppliers with excess movement, nested-semi shape):
      // per (supplier, 'small%' part), 1997 shipped quantity vs all-time —
      // the correlated 0.5·threshold cross-multiplied in DECIMAL
      // (2·q97 > q_all), computed in ONE conditional-sum aggregation;
      // qualifying suppliers semi-join into the EUROPE supplier roster
      (s, d) => {
        val zero = lit(0).cast("decimal(20,6)")
        val in97 = col("l_shipdate") >= expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
        val excess = t(s, d, "lineitem")
          .join(t(s, d, "part").where(col("p_name").like("small%"))
            .select(col("p_partkey")).hint("merge"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_suppkey"), col("l_partkey"),
            col("l_quantity").cast("decimal(20,6)").as("qd"), in97.as("_in97"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("qd")).as("q_all"),
            sum(when(col("_in97"), col("qd")).otherwise(zero)).as("q_97"))
          .where(col("q_97") * lit(2) > col("q_all"))
          .select(col("l_suppkey")).distinct()
        t(s, d, "supplier")
          .join(excess.hint("merge"), col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH base AS (SELECT l_suppkey, l_partkey,
            CAST(l_quantity AS DECIMAL(20,6)) AS qd, l_shipdate
          FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_name LIKE 'small%'),
        agg AS (SELECT l_suppkey, l_partkey, sum(qd) AS q_all,
            sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              THEN qd ELSE CAST(0 AS DECIMAL(20,6)) END) AS q_97
          FROM base GROUP BY 1, 2),
        excess AS (SELECT DISTINCT l_suppkey FROM agg WHERE q_97 * 2 > q_all)
        SELECT s_suppkey, s_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND EXISTS (SELECT 1 FROM excess WHERE excess.l_suppkey = s_suppkey)
        ORDER BY s_suppkey""")),

    QueryDef("q21_waiting_suppliers",
      // q21 analog (suppliers who kept orders waiting): late = shipped
      // >90 days after order date on finalized orders; keep late lines on
      // multi-supplier orders where NO other supplier was late — the
      // EXISTS as a residual-condition left_semi, the NOT EXISTS as the
      // matching left_anti against the late set itself
      (s, d) => {
        val late = t(s, d, "lineitem")
          .join(t(s, d, "orders").where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")).hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .where(datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")) > 90)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        val li2 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val late3 = late.select(col("ok").as("ok3"), col("sk").as("sk3"))
        late
          .join(li2.hint("merge"),
            col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
          .join(late3.hint("merge"),
            col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
          .join(t(s, d, "supplier").hint("merge"), col("sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""WITH late AS (SELECT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90)
        SELECT s_name, count(*) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY 1 ORDER BY numwait DESC, s_name""")),

    QueryDef("mm_image_whash",
      // frequency-domain perceptual hash (pHash idea, Walsh–Hadamard
      // instead of DCT → every coefficient an exact integer) through the
      // REAL codec: 16×16 PNGs with left-half gray a (from vec_id) vs
      // right-half 120 — the step construct's WHT is analytic (one AC
      // coefficient 8192·(a−b), the rest zero; median 0), so the oracle
      // states the full hash from vec_id alone
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 19 === 0).as[Long]
        val png = ids.mapPartitions { it =>
          it.map { id =>
            val a = (120 + ((id % 5).toInt - 2) * 40)
            val img = new java.awt.image.BufferedImage(16, 16,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var x = 0
            while (x < 16) {
              val g = if (x < 8) a else 120
              val c = (g << 16) | (g << 8) | g
              var y = 0
              while (y < 16) { img.setRGB(x, y, c); y += 1 }
              x += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        Multimodal.imageWHash(png, "vec_id")
          .select(col("id").as("vec_id"), col("ok"), col("whash_hex"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, TRUE AS ok,
          CASE WHEN 120 + (vec_id % 5 - 2) * 40 > 120
            THEN '0800000000000000' ELSE '0000000000000000' END AS whash_hex
        FROM embeddings WHERE vec_id % 19 = 0 ORDER BY vec_id""")),

    QueryDef("mm_image_near_dup",
      // END-TO-END image near-duplicate detection through the REAL codec:
      // encode a 16×16 PNG per row whose 2×2 blocks draw a 64-bit pattern
      // (white cells always threshold to 1, black to 0 — so aHash equals
      // the pattern EXACTLY), decode+hash with Multimodal.imageAHash, then
      // pair via the SAME 4×16-bit pigeonhole band join the text dedup
      // family uses (Dedup.hammingNearDupPairs — exact for hamming ≤ 3).
      // Patterns are planted: groups of 4 consecutive ids share a 60-bit
      // md5 base with nested low-bit flips {0,1,3,7} → in-group hammings
      // 1..3 all survive, cross-group md5 bases sit ~30 bits apart — and
      // the oracle brute-forces the identical criterion over the analytic
      // patterns, so codec, hash, and LSH must all agree bit for bit
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 7 === 0).as[Long]
        val png = ids.mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { id =>
            val j = id / 7
            val g = j / 4
            val mask = Array(0L, 1L, 3L, 7L)((j % 4).toInt)
            val hex = md.digest(g.toString.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString.take(15)
            val pat = java.lang.Long.parseLong(hex, 16) ^ mask
            val img = new java.awt.image.BufferedImage(16, 16,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var cell = 0
            while (cell < 64) {
              val colr = if (((pat >>> (63 - cell)) & 1L) == 1L) 0xffffff else 0x000000
              val bx = (cell % 8) * 2; val by = (cell / 8) * 2
              img.setRGB(bx, by, colr); img.setRGB(bx + 1, by, colr)
              img.setRGB(bx, by + 1, colr); img.setRGB(bx + 1, by + 1, colr)
              cell += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        val sig = Multimodal.imageAHash(png, "vec_id")
          .where(col("ok"))
          .select(col("id"), conv(col("ahash_hex"), 16, 10).cast("long").as("h"))
        Dedup.hammingNearDupPairs(sig, "id", "h", maxHamming = 3)
          .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH sel AS (SELECT vec_id, (vec_id // 7) // 4 AS g, (vec_id // 7) % 4 AS r
            FROM embeddings WHERE vec_id % 7 = 0),
          pat AS (SELECT vec_id,
            xor(('0x' || substring(md5(CAST(g AS VARCHAR)), 1, 15))::BIGINT,
              CASE r WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END) AS p
          FROM sel)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          CAST(bit_count(xor(a.p, b.p)) AS INTEGER) AS hamming
        FROM pat a JOIN pat b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.p, b.p)) <= 3
        ORDER BY id_a, id_b""")),

    QueryDef("txt_normalize",
      // Unicode normalization (the first transform of any mixed-source
      // text ingest; Spark has NO built-in) via the codegen
      // NormalizeExpr kernel: NFC, NFKC, and accent-strip (NFD → drop
      // Mn → NFC) over text with planted suffixes covering the four
      // interesting classes — combining sequence (Cafe+́ → Café),
      // precomposed accents (Ångström ñ), compatibility forms (ﬁ
      // ligature, fullwidth Ａ), and pure ASCII. The corpus itself is
      // ASCII (normalization-invariant under every form), so every
      // expected output is analytic and the oracle replays it
      // constructively — no cross-engine normalizer needed
      (s, d) => {
        import graft.functions.NormalizeOps
        val m = pmod(col("doc_id"), lit(4))
        // explicit \u escapes: m==0 is the DECOMPOSED sequence e+U+0301
        // (the whole point), and nothing depends on source-file encoding
        val suff = when(m === 0, lit(" Cafe\u0301"))
          .when(m === 1, lit(" \u00c5ngstr\u00f6m \u00f1"))
          .when(m === 2, lit(" \ufb01n \uff21b"))
          .otherwise(lit(""))
        t(s, d, "documents")
          .withColumn("raw", concat(col("text"), suff))
          .select(col("doc_id"),
            md5(NormalizeOps.nfc(col("raw"))).as("nfc_md5"),
            md5(NormalizeOps.nfkc(col("raw"))).as("nfkc_md5"),
            md5(NormalizeOps.stripAccents(col("raw"))).as("strip_md5"),
            (length(col("raw")) - length(NormalizeOps.nfc(col("raw"))))
              .as("nfc_delta"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH r AS (SELECT doc_id, text,
            CASE doc_id % 4 WHEN 0 THEN ' Cafe' || chr(769)
              WHEN 1 THEN ' ' || chr(197) || 'ngstr' || chr(246) || 'm ' || chr(241)
              WHEN 2 THEN ' ' || chr(64257) || 'n ' || chr(65313) || 'b'
              ELSE '' END AS suff,
            CASE doc_id % 4 WHEN 0 THEN ' Caf' || chr(233)
              WHEN 1 THEN ' ' || chr(197) || 'ngstr' || chr(246) || 'm ' || chr(241)
              WHEN 2 THEN ' ' || chr(64257) || 'n ' || chr(65313) || 'b'
              ELSE '' END AS nfc_suff,
            CASE doc_id % 4 WHEN 0 THEN ' Caf' || chr(233)
              WHEN 1 THEN ' ' || chr(197) || 'ngstr' || chr(246) || 'm ' || chr(241)
              WHEN 2 THEN ' fin Ab'
              ELSE '' END AS nfkc_suff,
            CASE doc_id % 4 WHEN 0 THEN ' Cafe'
              WHEN 1 THEN ' Angstrom n'
              WHEN 2 THEN ' ' || chr(64257) || 'n ' || chr(65313) || 'b'
              ELSE '' END AS strip_suff
          FROM documents)
        SELECT doc_id,
          md5(text || nfc_suff) AS nfc_md5,
          md5(text || nfkc_suff) AS nfkc_md5,
          md5(text || strip_suff) AS strip_md5,
          CAST(length(text || suff) - length(text || nfc_suff) AS INTEGER) AS nfc_delta
        FROM r ORDER BY doc_id""")),

    QueryDef("op_ohlc_bars",
      // time-bar resample (OHLC downsampling — the time-series face of
      // aggregation): hourly bars per event type; open/close are
      // min_by/max_by on the (ts, event_id) struct in ONE shuffle — no
      // corpus-wide window pass — mirrored by the oracle's row_number
      // window form; bar sum through DECIMAL
      (s, d) => Analytics.ohlcBars(eventsUs(s, d), col("event_type"),
          col("ts_us"), col("event_id"), col("value"), barUs = 3600000000L)
        .withColumnRenamed("key", "event_type")
        .orderBySmall(col("event_type"), col("bar_us")),
      Some("""WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id, value
            FROM events),
          b AS (SELECT event_type, ts_us - ts_us % 3600000000 AS bar_us,
              ts_us, event_id, value FROM ev),
          r AS (SELECT *,
              row_number() OVER (PARTITION BY event_type, bar_us
                ORDER BY ts_us, event_id) AS ra,
              row_number() OVER (PARTITION BY event_type, bar_us
                ORDER BY ts_us DESC, event_id DESC) AS rd
            FROM b)
        SELECT event_type, bar_us,
          max(CASE WHEN ra = 1 THEN value END) AS open,
          max(value) AS high, min(value) AS low,
          max(CASE WHEN rd = 1 THEN value END) AS close,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
        FROM r GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("ml_knn",
      // kNN classification COMPOSED from the exact ANN operator (the
      // label-propagation serving shape): top-5 cosine neighbors per
      // query → majority vote with a deterministic tie-break (max votes,
      // then smallest label, via ONE max(struct) agg — no window), plus
      // a per-query correctness flag against the query's own label
      (s, d) => {
        val e = t(s, d, "embeddings")
        val pred = Similarity.knnClassify(
          e.where(annQueryPred), e, "vec_id", "embedding", "label", 5)
        val qlab = e.where(annQueryPred)
          .select(col("vec_id").as("_qid"), col("label").as("_qlab"))
        pred.join(qlab.hint("merge"), col("query_id") === col("_qid"))
          .select(col("query_id"), col("pred_label"), col("votes"),
            (col("pred_label") === col("_qlab")).as("is_correct"))
          .orderBy(col("query_id"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlab
            FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2048),
          s AS (SELECT qid, vec_id AS nid, label AS nlab,
            list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * embedding[i]::DOUBLE)) /
            (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
             sqrt(list_sum(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS sim
            FROM embeddings CROSS JOIN q WHERE vec_id <> qid),
          r AS (SELECT qid, nlab FROM (
              SELECT qid, nlab, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
              FROM s) WHERE rnk <= 5),
          v AS (SELECT qid, nlab AS pred_label, count(*) AS votes FROM r GROUP BY 1, 2),
          p AS (SELECT qid, pred_label, votes FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, pred_label) AS rr
              FROM v) WHERE rr = 1)
        SELECT p.qid AS query_id, CAST(p.pred_label AS INTEGER) AS pred_label,
          votes, (p.pred_label = q.qlab) AS is_correct
        FROM p JOIN q ON p.qid = q.qid ORDER BY query_id""")),

    QueryDef("ml_kappa",
      // inter-annotator agreement (Cohen's kappa) over two planted
      // labelers: B disagrees with A exactly on doc_id%5==0 (shifted
      // class) and abstains (NULL) on doc_id%11==0 — kappa reduces to
      // ONE division of exact integers (n·agree − Σ nA·nB over n² − Σ),
      // computed from the bounded |classes|² cell table
      (s, d) => {
        val a = pmod(col("doc_id"), lit(3L))
        val b = when(pmod(col("doc_id"), lit(11L)) === 0, lit(null))
          .when(pmod(col("doc_id"), lit(5L)) === 0, pmod(col("doc_id") + 1, lit(3L)))
          .otherwise(a)
        MlEval.cohenKappa(t(s, d, "documents").select(a.as("la"), b.as("lb")),
          col("la"), col("lb"))
          .orderBySmall(col("n"))
      },
      Some("""WITH lab AS (SELECT doc_id % 3 AS la,
            CASE WHEN doc_id % 11 = 0 THEN NULL
              WHEN doc_id % 5 = 0 THEN (doc_id + 1) % 3
              ELSE doc_id % 3 END AS lb
          FROM documents),
        v AS (SELECT la, lb FROM lab WHERE la IS NOT NULL AND lb IS NOT NULL),
        tot AS (SELECT count(*) AS n,
            CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree FROM v),
        na AS (SELECT la AS k, count(*) AS c FROM v GROUP BY 1),
        nb AS (SELECT lb AS k, count(*) AS c FROM v GROUP BY 1),
        pr AS (SELECT CAST(coalesce(sum(na.c * nb.c), 0) AS BIGINT) AS sum_prod
          FROM na JOIN nb ON na.k = nb.k)
        SELECT n, n_agree, sum_prod,
          CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
          CAST(sum_prod AS DOUBLE) / CAST(n * n AS DOUBLE) AS pe,
          CASE WHEN n * n <> sum_prod THEN
            CAST(n * n_agree - sum_prod AS DOUBLE) / CAST(n * n - sum_prod AS DOUBLE)
          END AS kappa
        FROM tot CROSS JOIN pr ORDER BY n""")),

    QueryDef("op_cusum",
      // CUSUM change-point detection per event type — the sequential
      // drift detector as pure window algebra: the max(0, s+dev)
      // recursion rewritten EXACTLY as S − min(0, running min S) over
      // one partitioned sort; milli-scaled integers end to end
      (s, d) => Analytics.cusumAlarms(eventsUs(s, d), col("event_type"),
          col("ts_us"), col("event_id"),
          floor(col("value") * 1000).cast("long"),
          slackMilli = 0L, thresholdMilli = 2000000L)
        .orderBySmall(col("key")),
      Some("""WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS ts_us, event_id,
            CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
          tg AS (SELECT key, CAST(sum(v) // count(*) AS BIGINT) AS target_milli
            FROM ev GROUP BY 1),
          w AS (SELECT ev.key, ts_us, event_id, target_milli,
              sum(v - target_milli) OVER (PARTITION BY ev.key
                ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS s
            FROM ev JOIN tg USING (key)),
          cc AS (SELECT key, ts_us, target_milli,
              s - least(min(s) OVER (PARTITION BY key
                ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING), 0) AS cusum
            FROM w)
        SELECT key, count(*) AS n_points, CAST(max(target_milli) AS BIGINT) AS target_milli,
          CAST(max(cusum) AS BIGINT) AS max_cusum,
          CAST(sum(CASE WHEN cusum > 2000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
          min(CASE WHEN cusum > 2000000 THEN ts_us END) AS first_alarm_ts
        FROM cc GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_schema_evolution",
      // schema-evolution-tolerant source: generation 1 lands WITHOUT the
      // o_channel column, generation 2 adds it — `mergeSchema` unifies
      // the footers and g1 rows surface NULL channel (the additive-drift
      // contract every long-lived ingest needs; op_schema_drift PROFILES
      // the drift, this key READS across it). The oracle replays the
      // union relationally, so projection alignment must be exact
      (s, d) => {
        val dir = scratchDir("evo", d)
        val base = t(s, d, "orders")
        val g1 = base.where(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
        val g2 = base.where(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"),
            when(col("o_orderkey") % 5 === 0, lit("web")).otherwise(lit("store"))
              .as("o_channel"))
        g1.write.mode("overwrite").parquet(dir + "/gen=1")
        g2.write.mode("overwrite").parquet(dir + "/gen=2")
        s.read.option("mergeSchema", "true").parquet(dir + "/gen=1", dir + "/gen=2")
          .groupBy(col("o_channel"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 20, 2).as("sum_price"))
          .orderBySmall(col("o_channel"))
      },
      Some(s"""WITH u AS (
          SELECT o_orderkey, o_totalprice, NULL AS o_channel FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL
          SELECT o_orderkey, o_totalprice,
            CASE WHEN o_orderkey % 5 = 0 THEN 'web' ELSE 'store' END AS o_channel
          FROM orders WHERE o_orderkey % 2 = 1)
        SELECT o_channel, count(*) AS n_orders, ${dsumSql("o_totalprice", 20, 2)} AS sum_price
        FROM u GROUP BY 1 ORDER BY 1 NULLS FIRST""")),

    QueryDef("op_point_in_polygon",
      // geofencing (the polygon primitive one step up from the radius
      // join): boundary-inclusive point-in-convex-polygon via integer
      // cross products — EXACT, no epsilon — over the customer grid
      // coordinates; census per nation band. CCW/convexity of the
      // planted quadrilateral verified offline (signed area +4.2e6, all
      // consecutive-edge crosses positive)
      (s, d) => {
        val poly = Seq((100L, 200L), (1000L, 400L), (1100L, 2700L), (150L, 2500L))
        val p = t(s, d, "customer").select(
          (col("c_nationkey") % 5).as("band"),
          (col("c_custkey") * 7 % 1200).as("cx"),
          (col("c_custkey") * 13 % 3000).as("cy"))
        p.groupBy(col("band"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(Geo.pointInConvexPolygon(col("cx"), col("cy"), poly), 1L)
              .otherwise(0L)).as("n_inside"))
          .orderBySmall(col("band"))
      },
      Some(s"""WITH p AS (SELECT c_nationkey % 5 AS band,
            c_custkey * 7 % 1200 AS cx, c_custkey * 13 % 3000 AS cy FROM customer)
        SELECT band, count(*) AS n_total,
          CAST(sum(CASE WHEN ${Geo.pointInConvexPolygonSql("cx", "cy",
            Seq((100L, 200L), (1000L, 400L), (1100L, 2700L), (150L, 2500L)))}
            THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
        FROM p GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_rake",
      // RAKE keyword extraction: stopword-free runs as candidate
      // phrases, word score = deg·10⁶ div freq (integer millionths —
      // phrase scores become exact integer SUMS), bounded top-100 head;
      // the phrase-splitting regex is RE2-class and mirrors verbatim
      (s, d) => TextAnalysis.rakeKeywords(t(s, d, "documents"), "text",
        stopwords = Seq("a", "the"), topK = 100),
      Some("""WITH pad AS (SELECT ' ' || text || ' ' AS t FROM documents),
          p0 AS (SELECT unnest(string_split_regex(t, '(?:\s+(?:a|the))+\s+')) AS raw FROM pad),
          p1 AS (SELECT trim(regexp_replace(raw, '\s+', ' ', 'g')) AS phrase FROM p0),
          p2 AS (SELECT regexp_replace(regexp_replace(phrase,
              '^(?:(?:a|the) )+', ''), '( (?:a|the))+$', '') AS phrase
            FROM p1 WHERE len(phrase) > 0),
          inst AS (SELECT phrase, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words
            FROM p2 WHERE len(phrase) > 0),
          words AS (SELECT unnest(string_split(phrase, ' ')) AS w, n_words FROM inst),
          ws AS (SELECT w, CAST(sum(n_words) * 1000000 // count(*) AS BIGINT) AS sm
            FROM words GROUP BY 1),
          dp AS (SELECT phrase, max(n_words) AS n_words, count(*) AS n_occ
            FROM inst GROUP BY 1),
          pw AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dp),
          sc AS (SELECT pw.phrase, CAST(sum(ws.sm) AS BIGINT) AS score_micro
            FROM pw JOIN ws USING (w) GROUP BY 1)
        SELECT dp.phrase, dp.n_words, dp.n_occ, sc.score_micro
        FROM dp JOIN sc USING (phrase)
        ORDER BY score_micro DESC, phrase LIMIT 100""")),

    QueryDef("ml_hard_negatives",
      // contrastive-training triplet mining: per query, the best-ranked
      // same-label neighbor (positive) and best-ranked different-label
      // neighbor (hard negative) from the exact top-10 shortlist — each
      // one conditional min(struct) agg, NULL when the class is absent
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.hardNegatives(e.where(annQueryPred), e,
            "vec_id", "embedding", "label", 10)
          .orderBy(col("query_id"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlab
            FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2048),
          s AS (SELECT qid, qlab, vec_id AS nid, label AS nlab,
            list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * embedding[i]::DOUBLE)) /
            (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
             sqrt(list_sum(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS sim
            FROM embeddings CROSS JOIN q WHERE vec_id <> qid),
          r AS (SELECT qid, qlab, nid, nlab,
              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
            FROM s QUALIFY rnk <= 10),
          pos AS (SELECT qid, rnk, nid,
              row_number() OVER (PARTITION BY qid ORDER BY rnk) AS rr
            FROM r WHERE nlab = qlab),
          neg AS (SELECT qid, rnk, nid,
              row_number() OVER (PARTITION BY qid ORDER BY rnk) AS rr
            FROM r WHERE nlab <> qlab),
          qq AS (SELECT DISTINCT qid FROM r)
        SELECT qq.qid AS query_id,
          CAST(pos.rnk AS INTEGER) AS pos_rank, pos.nid AS pos_id,
          CAST(neg.rnk AS INTEGER) AS neg_rank, neg.nid AS neg_id
        FROM qq
        LEFT JOIN pos ON pos.qid = qq.qid AND pos.rr = 1
        LEFT JOIN neg ON neg.qid = qq.qid AND neg.rr = 1
        ORDER BY query_id""")),

    QueryDef("op_twap",
      // time-weighted average over the irregular event series (the mean
      // a plain avg() gets wrong off a regular grid): per type, each
      // value holds until the next event — exact µs durations weight
      // milli-scaled values in DECIMAL, one final division
      (s, d) => Analytics.timeWeightedAvg(eventsUs(s, d), col("event_type"),
          col("ts_us"), col("event_id"), floor(col("value") * 1000).cast("long"))
        .orderBySmall(col("key")),
      Some("""WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS ts_us, event_id,
            CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
          w AS (SELECT key, v,
              lead(ts_us) OVER (PARTITION BY key ORDER BY ts_us, event_id) - ts_us AS dur
            FROM ev)
        SELECT key, count(*) AS n_intervals, CAST(sum(dur) AS BIGINT) AS total_dur_us,
          CAST(sum(CAST(v AS DECIMAL(18,0)) * CAST(dur AS DECIMAL(18,0))) AS DOUBLE) /
            CAST(sum(dur) AS DOUBLE) AS twap_milli
        FROM w WHERE dur IS NOT NULL GROUP BY 1 ORDER BY 1""")),

    QueryDef("emb_centroid_drift",
      // embedding-distribution drift monitor: per label, cosine between
      // even/odd-cohort centroid directions in QUANTIZED space — int8
      // per-dim sums are exact integers (cosine of sums == cosine of
      // means), DECIMAL products, ONE final float expression
      (s, d) => Similarity.centroidDrift(t(s, d, "embeddings"), "vec_id",
          "embedding", "label", pmod(col("vec_id"), lit(2)))
        .orderBySmall(col("label")),
      Some("""WITH qz AS (SELECT vec_id, label, vec_id % 2 AS coh,
            CASE WHEN m = 0 THEN [0 FOR x IN embedding]
              ELSE [CAST(floor(CAST(x AS DOUBLE)/m*127 + 0.5) AS INTEGER) FOR x IN embedding]
            END AS q
          FROM (SELECT vec_id, label, embedding,
              CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS m
            FROM embeddings)),
          cells AS (SELECT label, coh,
              unnest(generate_series(1, len(q))) - 1 AS pos, unnest(q) AS v FROM qz),
          sums AS (SELECT label, coh, pos, CAST(sum(v) AS BIGINT) AS s
            FROM cells GROUP BY 1, 2, 3),
          j AS (SELECT a.label,
              sum(CAST(a.s AS DECIMAL(18,0)) * CAST(b.s AS DECIMAL(18,0))) AS num,
              sum(CAST(a.s AS DECIMAL(18,0)) * CAST(a.s AS DECIMAL(18,0))) AS na2,
              sum(CAST(b.s AS DECIMAL(18,0)) * CAST(b.s AS DECIMAL(18,0))) AS nb2
            FROM sums a JOIN sums b ON a.label = b.label AND a.pos = b.pos
            WHERE a.coh = 0 AND b.coh = 1 GROUP BY 1),
          cnt AS (SELECT label,
              CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM embeddings GROUP BY 1)
        SELECT cnt.label AS label, n_a, n_b,
          CAST(num AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
            AS drift_cos
        FROM cnt JOIN j ON cnt.label = j.label ORDER BY cnt.label""")),

    QueryDef("mm_gif_meta",
      // REAL GIF container parse (4th container format: PNG dims, WAV,
      // MP4 boxes, EXIF — now the GIF block grammar): builder-constructed
      // GIFs with analytic logical-screen dims, global-color-table size,
      // and frame count recovered by the block walk
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 29 === 0).as[Long]
        val gifs = ids.mapPartitions { it =>
          it.map { id =>
            (id, Multimodal.gifSampleBytes(
              width = (id % 300).toInt + 1, height = (id % 200).toInt + 1,
              frames = (id % 4).toInt + 1, gctBits = (id % 7).toInt + 1,
              v89 = id % 2 == 0))
          }
        }.toDF("vec_id", "payload")
        Multimodal.gifMeta(gifs, "vec_id")
          .select(col("id").as("vec_id"), col("ok"), col("version"),
            col("width"), col("height"), col("gct_entries"), col("n_frames"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, TRUE AS ok,
          CASE WHEN vec_id % 2 = 0 THEN '89a' ELSE '87a' END AS version,
          CAST(vec_id % 300 + 1 AS INTEGER) AS width,
          CAST(vec_id % 200 + 1 AS INTEGER) AS height,
          CAST(1 << CAST(vec_id % 7 + 1 AS INTEGER) AS INTEGER) AS gct_entries,
          CAST(vec_id % 4 + 1 AS INTEGER) AS n_frames
        FROM embeddings WHERE vec_id % 29 = 0 ORDER BY vec_id""")),

    QueryDef("op_table_checksum",
      // order-independent table fingerprint (the replication/migration
      // validator): SUM of 60-bit md5 row digests — no sort, one linear
      // pass, identical across engines and partition layouts; float
      // columns go through DECIMAL (float→string is not portable)
      (s, d) => Aggregates.tableChecksum(t(s, d, "orders"),
          Seq(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority"), col("o_totalprice").cast("decimal(20,2)")))
        .orderBySmall(col("n_rows")),
      Some("""SELECT count(*) AS n_rows,
          CAST(CAST(sum(('0x' || substring(md5(
            CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
            o_orderstatus || '|' || o_orderpriority || '|' ||
            CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS VARCHAR)), 1, 15))::BIGINT) AS DECIMAL(38,0)) AS VARCHAR)
            AS checksum
        FROM orders ORDER BY n_rows""")),

    QueryDef("ml_ab_test",
      // two-proportion A/B readout per event type (variant = user parity,
      // conversion = value > 100): exact integer exposure/conversion
      // counts in ONE agg; rates/lift/pooled z are a single
      // deterministic float expression over those integers
      (s, d) => MlEval.abTest(eventsUs(s, d), col("event_type"),
          col("user_id") % 2 === 1, col("value") > 100.0)
        .orderBySmall(col("grp")),
      Some("""WITH cells AS (SELECT event_type AS grp,
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
          FROM events GROUP BY 1)
        SELECT grp, n_a, conv_a, n_b, conv_b,
          CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
          CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
          CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) -
            CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS lift,
          CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
              AND conv_a + conv_b < n_a + n_b THEN
            (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) -
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) /
            sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
              (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
              (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
          END AS z_score
        FROM cells ORDER BY grp""")),

    QueryDef("op_scd2_merge",
      // SCD2 MERGE-apply (the write half: op_scd2 builds, op_scd2_lookup
      // reads, this APPLIES a change batch): per-user updates bump the
      // attribute at max(ts)+1000 — every 4th user re-sends its current
      // attribute (noop idempotency), 7 synthetic keys insert — audited
      // per action with exact interval durations
      (s, d) => {
        val ev = eventsUs(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val dim = ev.withColumn("valid_to", lead(col("ts_us"), 1).over(w))
          .select(col("user_id").as("key"), col("event_type").as("attr"),
            col("ts_us").as("valid_from"), col("valid_to"))
        val curAttr = ev.groupBy(col("user_id").as("k2"))
          .agg(max(struct(col("ts_us"), col("event_id"),
            col("event_type").as("et"))).getField("et").as("cur_attr"),
            max(col("ts_us")).as("_mx"))
        val updates = curAttr.select(col("k2").as("key"),
            when(col("k2") % 4 === 0, col("cur_attr"))
              .otherwise(concat(lit("v"), (col("k2") % 3).cast("string"))).as("attr"),
            (col("_mx") + 1000).as("ts"))
          .unionByName(ev.select((col("user_id") % 7 + 9000000).as("key")).distinct()
            .select(col("key"), lit("new").as("attr"), lit(0L).as("ts")))
        Transforms.scd2Apply(dim, updates)
          .groupBy(col("_action"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
            sum(when(col("valid_to").isNotNull, col("valid_to") - col("valid_from")))
              .as("dur_us"))
          .orderBySmall(col("_action"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
            FROM events),
          dim AS (SELECT user_id AS key, event_type AS attr, ts_us AS valid_from,
            lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to
            FROM ev),
          cur AS (SELECT key, attr, valid_from FROM dim WHERE valid_to IS NULL),
          la AS (SELECT user_id AS key, mx, event_type AS cur_attr FROM (
              SELECT user_id, event_type, max(ts_us) OVER (PARTITION BY user_id) AS mx,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts_us DESC, event_id DESC) AS rn
              FROM ev) WHERE rn = 1),
          upd AS (SELECT key,
              CASE WHEN key % 4 = 0 THEN cur_attr
                ELSE 'v' || CAST(key % 3 AS VARCHAR) END AS uattr,
              mx + 1000 AS uts
            FROM la
            UNION ALL
            SELECT DISTINCT user_id % 7 + 9000000 AS key, 'new' AS uattr, 0 AS uts FROM ev),
          j AS (SELECT coalesce(cur.key, upd.key) AS key, cur.attr, cur.valid_from,
              upd.uattr, upd.uts
            FROM cur FULL OUTER JOIN upd ON cur.key = upd.key),
          merged AS (
            SELECT key, attr, valid_from, valid_to, 'history' AS action
              FROM dim WHERE valid_to IS NOT NULL
            UNION ALL
            SELECT key, attr, valid_from, NULL, 'noop' FROM j
              WHERE uattr IS NULL OR (attr IS NOT NULL AND attr = uattr)
            UNION ALL
            SELECT key, attr, valid_from, uts, 'closed' FROM j
              WHERE attr IS NOT NULL AND uattr IS NOT NULL AND attr <> uattr
            UNION ALL
            SELECT key, uattr, uts, NULL, 'opened' FROM j
              WHERE attr IS NOT NULL AND uattr IS NOT NULL AND attr <> uattr
            UNION ALL
            SELECT key, uattr, uts, NULL, 'inserted' FROM j
              WHERE attr IS NULL AND uattr IS NOT NULL)
        SELECT action AS _action, count(*) AS n,
          CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
          CAST(sum(CASE WHEN valid_to IS NOT NULL THEN valid_to - valid_from END) AS BIGINT)
            AS dur_us
        FROM merged GROUP BY 1 ORDER BY 1""")),

    QueryDef("mix_epochs",
      // fractional-epoch source schedule (Llama/GPT data recipes):
      // src0 2.3 epochs, src1 1.0, src2 0.5, src3 dropped — full copies
      // plus a deterministic hash-selected partial epoch, each copy
      // tagged with its epoch index; per-(source, epoch) census out
      (s, d) => Sampling.mixByEpochs(t(s, d, "documents"), col("doc_id"),
          col("source"),
          centiEpochs = Map("src0" -> 230, "src1" -> 100, "src2" -> 50, "src3" -> 0))
        .groupBy(col("source"), col("epoch"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBySmall(col("source"), col("epoch")),
      Some("""WITH e AS (SELECT doc_id, source,
            CASE source WHEN 'src0' THEN 230 WHEN 'src1' THEN 100
              WHEN 'src2' THEN 50 WHEN 'src3' THEN 0 ELSE 100 END AS centi
          FROM documents),
        x AS (SELECT doc_id, source, centi,
            unnest(range(0, centi // 100 + CASE WHEN centi % 100 > 0 THEN 1 ELSE 0 END)) AS epoch
          FROM e)
        SELECT source, CAST(epoch AS INTEGER) AS epoch, count(*) AS n_docs
        FROM x
        WHERE epoch < centi // 100
           OR ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR)), 1, 8))::BIGINT % 100 < centi % 100
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    QueryDef("op_acid_delete",
      // GDPR-style keyed DELETE through the ACID commit protocol:
      // tombstones anti-join affected dirs copy-on-write (disjoint dirs
      // survive via the stats prune), committed as a new version — the
      // oracle is the relational complement, so the protocol must be
      // invisible in the data
      (s, d) => {
        val tmpDir = System.getProperty("java.io.tmpdir")
        val prefix = "graft_del_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_"
        val root = tmpDir + "/" + prefix + ProcessHandle.current().pid()
        val rp = new org.apache.hadoop.fs.Path(root)
        val fs = rp.getFileSystem(s.sparkContext.hadoopConfiguration)
        val stale = new java.io.File(tmpDir).listFiles()
        if (stale != null) stale.iterator
          .filter(f => f.getName.startsWith(prefix) && f.getName != rp.getName)
          .filter(f => f.lastModified() < System.currentTimeMillis() - 3600 * 1000L)
          .foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f.getPath), true))
        fs.delete(rp, true)
        val base = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        val mt = ManifestTable(s, root)
        mt.overwrite(base)
        mt.deleteByKeys(base.where(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey")), Seq("o_orderkey"))
        mt.snapshot().orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""")),

    QueryDef("ann_filtered_topk",
      // filtered vector search (the serving question "nearest WITH
      // label=1"): the metadata predicate applies BEFORE scoring
      // (pre-filter — exact recall by construction; post-filtering a
      // top-k shortlist can starve below k), then the same bounded
      // two-stage top-k as ann_cosine_topk over the thinned corpus
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.bruteForceTopK(e.where(annQueryPred),
            e.where(col("label") === 1), "vec_id", "embedding", 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2048),
        c AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
        s AS (SELECT qid, vec_id AS nid,
          list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * embedding[i]::DOUBLE)) /
          (sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) *
           sqrt(list_sum(list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS sim
          FROM c CROSS JOIN q WHERE vec_id <> qid)
        SELECT qid AS query_id, CAST(rank AS INTEGER) AS rank, nid AS neighbor_id FROM (
          SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- round-10 wave: frontier / sequence / diff / recall ----

    QueryDef("op_skyline",
      // 2-D Pareto frontier over parts (minimize p_size, maximize
      // p_retailprice) via the bounded-cost-domain group-cumsum shape —
      // one corpus agg + a 50-row window + a broadcast probe, never the
      // quadratic NOT-EXISTS. The oracle replays the same analytic.
      (s, d) => Analytics.skyline2D(
          t(s, d, "part").select(col("p_partkey"), col("p_size"), col("p_retailprice")),
          "p_size", "p_retailprice")
        .orderBy(col("p_size"), col("p_partkey")),
      Some("""WITH pc AS (SELECT p_size, max(p_retailprice) AS vmax FROM part GROUP BY 1),
        fr AS (SELECT p_size, vmax FROM (
            SELECT p_size, vmax,
              max(vmax) OVER (ORDER BY p_size ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
            FROM pc) WHERE prev IS NULL OR vmax > prev)
        SELECT p.p_partkey, p.p_size, p.p_retailprice
        FROM part p JOIN fr ON p.p_size = fr.p_size AND p.p_retailprice = fr.vmax
        ORDER BY p.p_size, p.p_partkey""")),

    QueryDef("op_sequence_patterns",
      // contiguous 3-gram pattern mining over per-user event timelines
      // (the candidate-free PrefixSpan special case): one user-window
      // pass, one bounded agg (≤|types|³ = 125 cells at any SF)
      (s, d) => Analytics.sequencePatterns(eventsUs(s, d), col("user_id"),
          Seq(col("ts_us"), col("event_id")), col("event_type"), k = 3)
        .orderBySmall(col("n").desc, col("s0"), col("s1"), col("s2")),
      Some("""WITH g AS (SELECT event_type AS s0,
            lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
          FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        SELECT s0, s1, s2, CAST(count(*) AS BIGINT) AS n FROM g
        WHERE s1 IS NOT NULL AND s2 IS NOT NULL GROUP BY 1, 2, 3
        ORDER BY n DESC, s0, s1, s2""")),

    QueryDef("op_table_diff",
      // lakehouse version diff: v1 is a deterministic mutation of orders
      // (doubled prices on %10, deletes on %1000=7, inserts on %1000=1);
      // tableDiff classifies every key in ONE null-safe full-outer SMJ,
      // then a bounded 4-row status census with exact decimal sums
      (s, d) => {
        val v0 = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val v1 = v0.where(col("o_orderkey") % 1000 =!= 7)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("o_totalprice"),
            col("o_orderstatus"))
          .unionByName(v0.where(col("o_orderkey") % 1000 === 1)
            .select((-col("o_orderkey") - 1).as("o_orderkey"),
              lit(1.0).as("o_totalprice"), lit("O").as("o_orderstatus")))
        Transforms.tableDiff(v0, v1, Seq("o_orderkey"),
            Seq("o_totalprice", "o_orderstatus"))
          .groupBy(col("diff_status"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice_old").cast("decimal(28,2)")).cast("double").as("sum_old"),
            sum(col("o_totalprice_new").cast("decimal(28,2)")).cast("double").as("sum_new"))
          .orderBySmall(col("diff_status"))
      },
      Some("""WITH v0 AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        v1 AS (SELECT o_orderkey,
            CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
            o_orderstatus
          FROM orders WHERE o_orderkey % 1000 <> 7
          UNION ALL SELECT -o_orderkey - 1, 1.0, 'O' FROM orders WHERE o_orderkey % 1000 = 1),
        dd AS (SELECT a.o_totalprice AS po, b.o_totalprice AS pn,
            CASE WHEN a.o_orderkey IS NULL THEN 'added'
                 WHEN b.o_orderkey IS NULL THEN 'removed'
                 WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus THEN 'changed'
                 ELSE 'unchanged' END AS diff_status
          FROM v0 a FULL OUTER JOIN v1 b ON a.o_orderkey = b.o_orderkey)
        SELECT diff_status, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(po AS DECIMAL(28,2))) AS DOUBLE) AS sum_old,
          CAST(sum(CAST(pn AS DECIMAL(28,2))) AS DOUBLE) AS sum_new
        FROM dd GROUP BY 1 ORDER BY 1""")),

    QueryDef("ann_recall_at_k",
      // the ANN EVALUATION harness: recall@5 of the IVF route→probe path
      // against exact brute force, per query, as exact integers (hits ∈
      // 0..5, recall in millionths) — the metric a 100-TB index tuning
      // loop actually monitors. Composes the two existing operators on
      // the integer lattice so the full funnel is hash-replayable.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          latticeVec.as("embedding"))
        val q = e.where(annQueryPred)
        val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        val ivf = Similarity.ivfTopK(q, e, "vec_id", "embedding", "label",
            k = 5, nprobe = 3)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("_hit"))
        exact.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(sum(coalesce(col("_hit"), lit(0))).cast("int").as("hits"))
          .select(col("query_id"), col("hits"),
            expr("CAST((hits * 1000000) div 5 AS BIGINT)").as("recall_millionths"))
          .orderBySmall(col("query_id"))
      },
      Some(s"""WITH $latticeBaseCte,
        ${meanCteSql("base", "label", "cent")},
        routed AS (SELECT s.vec_id AS qid, s.v AS qv, cent.label,
            ${cosSql("s.v", "cent.c")} AS c_sim
          FROM base s CROSS JOIN cent WHERE s.vec_id % 10 = 0 AND s.vec_id < 2048),
        probes AS (SELECT qid, qv, label FROM (
            SELECT qid, qv, label,
              row_number() OVER (PARTITION BY qid ORDER BY c_sim DESC, label ASC) AS pr
            FROM routed) WHERE pr <= 3),
        iscored AS (SELECT p.qid, s.vec_id AS nid, ${cosSql("p.qv", "s.v")} AS sim
          FROM probes p JOIN base s ON p.label = s.label WHERE s.vec_id <> p.qid),
        ivf AS (SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM iscored) WHERE r <= 5),
        qq AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id % 10 = 0 AND vec_id < 2048),
        escored AS (SELECT qq.qid, s.vec_id AS nid, ${cosSql("qq.qv", "s.v")} AS sim
          FROM base s CROSS JOIN qq WHERE s.vec_id <> qq.qid),
        exact AS (SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r
            FROM escored) WHERE r <= 5)
        SELECT e.qid AS query_id, CAST(count(i.nid) AS INTEGER) AS hits,
          CAST(count(i.nid) * 1000000 // 5 AS BIGINT) AS recall_millionths
        FROM exact e LEFT JOIN ivf i ON i.qid = e.qid AND i.nid = e.nid
        GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_doc_surprisal",
      // LM-based document quality: per-doc mean inverse bigram transition
      // probability in exact integer millionths (the log-free perplexity
      // stand-in — see TextAnalysis.docSurprisal's scaladoc), one final
      // IEEE division per doc
      (s, d) => TextAnalysis.docSurprisal(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tk AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
          FROM documents),
        g AS (SELECT doc_id,
            unnest([toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks) - 1)]) AS gram
          FROM tk WHERE len(toks) >= 2),
        nb AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_xy FROM g GROUP BY 1),
        nx AS (SELECT split_part(gram, ' ', 1) AS x, CAST(count(*) AS BIGINT) AS n_x
          FROM g GROUP BY 1),
        terms AS (SELECT g.doc_id, 1000000 * nx.n_x // nb.n_xy AS t
          FROM g JOIN nb USING (gram) JOIN nx ON nx.x = split_part(g.gram, ' ', 1))
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(t) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_surprisal
        FROM terms GROUP BY 1 ORDER BY doc_id""")),

    QueryDef("mm_audio_neardup",
      // END-TO-END audio near-duplicate detection through the REAL codec
      // (mm_image_near_dup's shape for sound): encode WAVs whose 64
      // constant-amplitude 16-frame windows draw a deterministic energy
      // contour — groups of 4 consecutive decimated ids share a base
      // contour, members m>0 boost windows {5m, 5m+1} by 500, flipping at
      // most the two boundary delta bits — fingerprint with
      // Multimodal.audioFingerprint (63 sign-of-derivative bits), pair
      // via the SAME 4×16-bit pigeonhole band join the image/text dedup
      // families use. The oracle replays contour, bits, and the hamming
      // criterion analytically, so codec, fingerprint, and LSH must all
      // agree bit for bit.
      (s, d) => {
        import s.implicits._
        val ids = t(s, d, "embeddings").select(col("vec_id"))
          .where(col("vec_id") % 7 === 0).as[Long]
        val wav = ids.mapPartitions { it =>
          it.map { id =>
            val j = id / 7; val g = j / 4; val m = (j % 4).toInt
            val pcm = new Array[Byte](64 * 16 * 2)
            var w = 0
            while (w < 64) {
              val base = ((g * 31 + w * 17) % 997 + 10).toInt
              val amp = (base +
                (if (m > 0 && (w == 5 * m || w == 5 * m + 1)) 500 else 0)).toShort
              var f = 0
              while (f < 16) {
                val i = w * 16 + f
                pcm(2 * i) = (amp & 0xff).toByte; pcm(2 * i + 1) = (amp >> 8).toByte
                f += 1
              }
              w += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, 1024L),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            (id, bos.toByteArray)
          }
        }.toDF("vec_id", "payload")
        val fp = Multimodal.audioFingerprint(wav, "vec_id", windows = 64)
          .where(col("ok")).select(col("id"), col("fp"))
        Dedup.hammingNearDupPairs(fp, "id", "fp", maxHamming = 3)
          .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"), col("hamming"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH sel AS (SELECT vec_id, (vec_id // 7) // 4 AS g, (vec_id // 7) % 4 AS m
            FROM embeddings WHERE vec_id % 7 = 0),
        amp AS (SELECT vec_id, w,
            (g * 31 + w * 17) % 997 + 10 +
              CASE WHEN m > 0 AND (w = 5 * m OR w = 5 * m + 1) THEN 500 ELSE 0 END AS a
          FROM sel CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS w)),
        dd AS (SELECT vec_id, w, a AS a0,
            lead(a) OVER (PARTITION BY vec_id ORDER BY w) AS a1 FROM amp),
        fp AS (SELECT vec_id,
            CAST(sum(CASE WHEN a1 > a0 THEN 1::BIGINT << w ELSE 0 END) AS BIGINT) AS f
          FROM dd WHERE a1 IS NOT NULL GROUP BY 1)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
        FROM fp a JOIN fp b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.f, b.f)) <= 3
        ORDER BY id_a, id_b""")),

    QueryDef("op_gini_impurity",
      // per-source Gini impurity of the language mix — the EXACT
      // (log-free) diversity signal; decimal squares mirror HUGEINT,
      // one final float division
      (s, d) => Analytics.giniImpurity(t(s, d, "documents"),
          col("source"), col("lang"))
        .select(col("grp").as("source"), col("n"), col("gini"))
        .orderBySmall(col("source")),
      Some("""WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1, 2),
          g AS (SELECT source, CAST(sum(c) AS BIGINT) AS n, sum(c * c) AS ssq
            FROM c GROUP BY 1)
        SELECT source, n,
          CAST(n::HUGEINT * n - ssq AS DOUBLE) / CAST(n::HUGEINT * n AS DOUBLE) AS gini
        FROM g ORDER BY source""")),

    QueryDef("op_benford",
      // Benford first-digit audit over order totals (integer cents):
      // exact observed shares vs the PRECOMPUTED log10(1+1/d) literal
      // table — no query-time logs, so both engines agree bit for bit
      (s, d) => Analytics.benfordAudit(t(s, d, "orders"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
        .orderBySmall(col("digit")),
      Some("""WITH v AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x
            FROM orders WHERE CAST(floor(o_totalprice * 100) AS BIGINT) > 0),
          c AS (SELECT CAST(substring(CAST(x AS VARCHAR), 1, 1) AS INTEGER) AS digit,
              CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
          e AS (SELECT digit, n,
              CAST(1000000 * n // total AS BIGINT) AS observed_millionths,
              CAST(CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
                WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
                WHEN 7 THEN 57991 WHEN 8 THEN 51152 WHEN 9 THEN 45757 END AS BIGINT)
                AS expected_millionths
            FROM c CROSS JOIN t)
        SELECT digit, n, observed_millionths, expected_millionths,
          abs(observed_millionths - expected_millionths) AS deviation_millionths
        FROM e ORDER BY digit""")),

    QueryDef("op_weighted_median",
      // weighted median of quantity weighted by price, per returnflag —
      // the aucExact group-cumsum shape for weighted quantiles: exact
      // decimal weights over the bounded quantity domain, lower-median
      // pick by exact comparison
      (s, d) => Analytics.weightedMedianQuantized(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"), scale = 2)
        .select(col("grp").as("l_returnflag"), col("median"), col("total_weight"))
        .orderBySmall(col("l_returnflag")),
      Some("""WITH wq AS (SELECT l_returnflag AS g, l_quantity AS v,
            sum(CAST(l_extendedprice AS DECIMAL(38,2))) AS w
          FROM lineitem GROUP BY 1, 2),
        c AS (SELECT g, v, w,
            sum(w) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(w) OVER (PARTITION BY g) AS tot
          FROM wq)
        SELECT g AS l_returnflag, min(CASE WHEN cum * 2 >= tot THEN v END) AS median,
          CAST(max(tot) AS DOUBLE) AS total_weight
        FROM c GROUP BY 1 ORDER BY 1""")),

    QueryDef("ann_index_persist",
      // the STORED-index serving lifecycle (what a production vector store
      // actually does between fit and query): Lloyd's fit → write the
      // assignment table to parquet PARTITIONED BY CLUSTER + the centroid
      // table beside it → reload both → route queries with the reloaded
      // centroids → probe. Because the corpus is cluster-partitioned on
      // disk, the probe join on the partition column lets Spark prune
      // cells at scan time (dynamic partition pruning — the IVF payoff
      // expressed in STORAGE layout, not just join shape). Results must
      // equal the in-memory ann_ivf_fit exactly — same oracle — since
      // lattice doubles/floats and centroid doubles roundtrip parquet
      // bit-identically; a storage-layer type or partition bug breaks the
      // hash.
      (s, d) => {
        import s.implicits._
        val dir = scratchDir("ivfindex", d)
        val e = t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("embedding"))
        val cents = Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 16, iters = 3, seedKey = c => md5(c.cast("string")))
        e.withColumn("cluster", Similarity.nearestCentroid(col("embedding"), cents))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/assign")
        cents.zipWithIndex.toSeq.map { case (c, j) => (j, c) }.toDF("j", "c")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/cents")
        val centsBack = s.read.parquet(s"$dir/cents").orderBy(col("j"))
          .collect().map(_.getSeq[Double](1).toArray)
        val corpus = s.read.parquet(s"$dir/assign")
        Similarity.ivfTopKFitted(corpus.where(annQueryPred), corpus,
            "vec_id", "embedding", "cluster", k = 5, nprobe = 4, centsBack)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      // identical math to ann_ivf_fit — the roundtrip must be invisible
      Some(s"""WITH $latticeBaseCte,
        ${kmeansCtesSql(k = 16, iters = 3)},
        lab AS (SELECT vec_id, v, j AS lbl FROM (
            SELECT b.vec_id, b.v, c.j,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM base b CROSS JOIN c3 c) WHERE rn = 1),
        cent AS (SELECT j AS lbl, c FROM c3),
        ${ivfTailSql("lab", "lbl", nprobe = 4)}""")),

    QueryDef("op_interval_union",
      // covered time per user: each event opens an interval of
      // value-milliseconds; overlapping coverage must not double-count.
      // One key-window sweep, exact integer µs
      (s, d) => Analytics.intervalUnionLength(
          eventsUs(s, d).withColumn("end_us",
            col("ts_us") + expr("CAST(floor(value * 1000) AS BIGINT) * 1000")),
          col("user_id"), Seq(col("ts_us"), col("event_id")),
          col("ts_us"), col("end_us"))
        .withColumnRenamed("grp", "user_id")
        .orderBy(col("user_id")),
      Some("""WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
            epoch_us(ts) + CAST(floor(value * 1000) AS BIGINT) * 1000 AS e
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        sw AS (SELECT user_id, e,
            max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax, s
          FROM iv)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
          CAST(sum(greatest(e - greatest(s, coalesce(pmax, s)), 0)) AS BIGINT) AS covered
        FROM sw GROUP BY 1 ORDER BY user_id""")),

    QueryDef("op_graph_lcc",
      // per-node local clustering coefficient on the bounded orders mod
      // graph (97 nodes at any SF): the same degree-ordered triangle
      // enumeration as op_triangles, credited to each corner; the oracle
      // enumerates with id-ascending orientation — node counts are
      // invariant to the orientation total order, which the hash checks
      (s, d) => Analytics.localClustering(
          t(s, d, "orders").select((col("o_custkey") % 97).as("src"),
            (col("o_orderkey") % 97).as("dst")),
          "src", "dst")
        .orderBySmall(col("node")),
      Some("""WITH e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM (SELECT o_custkey % 97 AS src, o_orderkey % 97 AS dst FROM orders)
          WHERE src <> dst),
        deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM
          (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
          FROM e0 a JOIN e0 b ON b.u = a.v JOIN e0 c ON c.u = a.u AND c.v = b.v),
        tn AS (SELECT x AS node, CAST(count(*) AS BIGINT) AS n_tri FROM
          (SELECT x FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
          GROUP BY 1)
        SELECT deg.x AS node, deg.d AS degree,
          CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_triangles,
          CASE WHEN deg.d >= 2 THEN
            CAST(coalesce(tn.n_tri, 0) * 2 AS DOUBLE) / CAST(deg.d * (deg.d - 1) AS DOUBLE)
          ELSE 0.0 END AS lcc
        FROM deg LEFT JOIN tn ON tn.node = deg.x ORDER BY node""")),

    QueryDef("op_autocorr",
      // lag-1..3 autocorrelation of the event value series per type —
      // exact decimal Pearson moments over lead pairs, corr as the
      // op_regression double tree (see Analytics.autocorrelation)
      (s, d) => Analytics.autocorrelation(eventsUs(s, d), col("event_type"),
          Seq(col("ts_us"), col("event_id")),
          expr("CAST(floor(value * 1000) AS BIGINT)"), maxLag = 3)
        .withColumnRenamed("grp", "event_type")
        .orderBySmall(col("event_type")),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
            CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        l AS (SELECT event_type, v,
            lead(v, 1) OVER w AS l1, lead(v, 2) OVER w AS l2, lead(v, 3) OVER w AS l3
          FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
        m AS (SELECT event_type,
            CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            sum(CASE WHEN l1 IS NOT NULL THEN v::HUGEINT END) AS sx1,
            sum(CASE WHEN l1 IS NOT NULL THEN l1::HUGEINT END) AS sy1,
            sum(CASE WHEN l1 IS NOT NULL THEN v::HUGEINT * v END) AS sxx1,
            sum(CASE WHEN l1 IS NOT NULL THEN l1::HUGEINT * l1 END) AS syy1,
            sum(CASE WHEN l1 IS NOT NULL THEN v::HUGEINT * l1 END) AS sxy1,
            CAST(sum(CASE WHEN l2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            sum(CASE WHEN l2 IS NOT NULL THEN v::HUGEINT END) AS sx2,
            sum(CASE WHEN l2 IS NOT NULL THEN l2::HUGEINT END) AS sy2,
            sum(CASE WHEN l2 IS NOT NULL THEN v::HUGEINT * v END) AS sxx2,
            sum(CASE WHEN l2 IS NOT NULL THEN l2::HUGEINT * l2 END) AS syy2,
            sum(CASE WHEN l2 IS NOT NULL THEN v::HUGEINT * l2 END) AS sxy2,
            CAST(sum(CASE WHEN l3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3,
            sum(CASE WHEN l3 IS NOT NULL THEN v::HUGEINT END) AS sx3,
            sum(CASE WHEN l3 IS NOT NULL THEN l3::HUGEINT END) AS sy3,
            sum(CASE WHEN l3 IS NOT NULL THEN v::HUGEINT * v END) AS sxx3,
            sum(CASE WHEN l3 IS NOT NULL THEN l3::HUGEINT * l3 END) AS syy3,
            sum(CASE WHEN l3 IS NOT NULL THEN v::HUGEINT * l3 END) AS sxy3
          FROM l GROUP BY 1)
        SELECT event_type, n1 AS n_pairs_1, n2 AS n_pairs_2, n3 AS n_pairs_3,
          CASE WHEN n1 > 0
              AND CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) > 0
              AND CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) > 0
            THEN (CAST(n1 AS DOUBLE) * CAST(sxy1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy1 AS DOUBLE)) /
              sqrt((CAST(n1 AS DOUBLE) * CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) *
                (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))) END AS acf_1,
          CASE WHEN n2 > 0
              AND CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) > 0
              AND CAST(n2 AS DOUBLE) * CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE) > 0
            THEN (CAST(n2 AS DOUBLE) * CAST(sxy2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy2 AS DOUBLE)) /
              sqrt((CAST(n2 AS DOUBLE) * CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)) *
                (CAST(n2 AS DOUBLE) * CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE) * CAST(sy2 AS DOUBLE))) END AS acf_2,
          CASE WHEN n3 > 0
              AND CAST(n3 AS DOUBLE) * CAST(sxx3 AS DOUBLE) - CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE) > 0
              AND CAST(n3 AS DOUBLE) * CAST(syy3 AS DOUBLE) - CAST(sy3 AS DOUBLE) * CAST(sy3 AS DOUBLE) > 0
            THEN (CAST(n3 AS DOUBLE) * CAST(sxy3 AS DOUBLE) - CAST(sx3 AS DOUBLE) * CAST(sy3 AS DOUBLE)) /
              sqrt((CAST(n3 AS DOUBLE) * CAST(sxx3 AS DOUBLE) - CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE)) *
                (CAST(n3 AS DOUBLE) * CAST(syy3 AS DOUBLE) - CAST(sy3 AS DOUBLE) * CAST(sy3 AS DOUBLE))) END AS acf_3
        FROM m ORDER BY 1""")),

    QueryDef("op_assortativity",
      // Newman's degree assortativity on the bounded orders mod graph —
      // symmetrized endpoint-degree Pearson from exact decimal moments,
      // one corr double tree (see Analytics.degreeAssortativity)
      (s, d) => Analytics.degreeAssortativity(
        t(s, d, "orders").select((col("o_custkey") % 97).as("src"),
          (col("o_orderkey") % 97).as("dst")), "src", "dst"),
      Some("""WITH e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM (SELECT o_custkey % 97 AS src, o_orderkey % 97 AS dst FROM orders)
          WHERE src <> dst),
        deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM
          (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        j AS (SELECT a.d AS du, b.d AS dv
          FROM e0 JOIN deg a ON a.x = e0.u JOIN deg b ON b.x = e0.v),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
            sum(du::HUGEINT + dv) AS sx,
            sum(du::HUGEINT * du + dv::HUGEINT * dv) AS sxx,
            sum(du::HUGEINT * dv * 2) AS sxy
          FROM j)
        SELECT n_edges,
          CASE WHEN CAST(n_edges * 2 AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN (CAST(n_edges * 2 AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
              (CAST(n_edges * 2 AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS r
        FROM m""")),

    QueryDef("op_peaks_runs",
      // row-pattern census over the per-type event value series: local
      // extrema + longest strictly-monotone runs (gaps-and-islands) —
      // the MATCH_RECOGNIZE class, integer-exact
      (s, d) => Analytics.peakRunStats(eventsUs(s, d), col("event_type"),
          Seq(col("ts_us"), col("event_id")),
          expr("CAST(floor(value * 1000) AS BIGINT)"))
        .withColumnRenamed("grp", "event_type")
        .orderBySmall(col("event_type")),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, event_id,
            CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        m AS (SELECT event_type, ts_us, event_id, v,
            lag(v) OVER w AS prev, lead(v) OVER w AS nxt,
            CASE WHEN lag(v) OVER w IS NULL THEN 0
                 WHEN v > lag(v) OVER w THEN 1
                 WHEN v < lag(v) OVER w THEN -1 ELSE 0 END AS dir
          FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
        m2 AS (SELECT event_type, ts_us, event_id, v, prev, nxt, dir,
            CASE WHEN lag(dir) OVER w2 IS NULL OR dir <> lag(dir) OVER w2
              THEN 1 ELSE 0 END AS chg
          FROM m WINDOW w2 AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
        m3 AS (SELECT event_type, v, prev, nxt, dir,
            sum(chg) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM m2),
        runs AS (SELECT event_type,
            CAST(max(CASE WHEN dir = 1 THEN len END) AS BIGINT) AS lu,
            CAST(max(CASE WHEN dir = -1 THEN len END) AS BIGINT) AS ld
          FROM (SELECT event_type, run, dir, count(*) AS len FROM m3
            WHERE dir <> 0 GROUP BY 1, 2, 3) GROUP BY 1),
        peaks AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
              AND v > prev AND v > nxt THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
            CAST(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
              AND v < prev AND v < nxt THEN 1 ELSE 0 END) AS BIGINT) AS n_valleys
          FROM m2 GROUP BY 1)
        SELECT p.event_type, n_rows, n_peaks, n_valleys,
          coalesce(lu, 0) AS longest_up, coalesce(ld, 0) AS longest_down
        FROM peaks p LEFT JOIN runs USING (event_type)
        ORDER BY p.event_type""")),

    QueryDef("op_bitemporal",
      // BITEMPORAL querying — the two time axes composed: TRANSACTION
      // time from ManifestTable versions (what the store knew when) ×
      // VALID time from SCD2 intervals (what was true when). Three
      // as-of reads prove the distinction: at transaction v1 the store
      // doesn't know the valid-time-100 change even when asked about
      // t=150 (t1v150); at v2 asking about t=50 still sees the OLD
      // attribute (the closed interval covers 50); only (v2, t=150)
      // sees the change. The oracle replays all three states
      // analytically from the construct.
      (s, d) => {
        val dir = scratchDir("bitemporal", d)
        val table = ManifestTable(s, s"$dir/dim")
        val dim0 = t(s, d, "customer").where(col("c_custkey") < 200)
          .select(col("c_custkey").as("key"), col("c_mktsegment").as("attr"),
            lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
        table.merge(dim0, Seq("key", "valid_from"))
        val v1 = table.latestVersion().get
        val changed = dim0.where(col("key") % 3 === 0)
        val delta = changed.select(col("key"), col("attr"), col("valid_from"),
            lit(100L).as("valid_to"))
          .unionByName(changed.select(col("key"), lit("MOVED").as("attr"),
            lit(100L).as("valid_from"), lit(null).cast("long").as("valid_to")))
        table.merge(delta, Seq("key", "valid_from"))
        val v2 = table.latestVersion().get
        def asOf(v: Long, tq: Long, label: String) =
          table.snapshotAt(v)
            .where(col("valid_from") <= tq &&
              (col("valid_to").isNull || col("valid_to") > tq))
            .groupBy(col("attr"))
            .agg(count(lit(1)).as("n"))
            .select(lit(label).as("view"), col("attr"), col("n"))
        asOf(v1, 150L, "t1v150")
          .unionByName(asOf(v2, 50L, "t2v50"))
          .unionByName(asOf(v2, 150L, "t2v150"))
          .orderBySmall(col("view"), col("attr"))
      },
      Some("""WITH dim AS (SELECT c_custkey AS key, c_mktsegment AS attr
            FROM customer WHERE c_custkey < 200)
        SELECT * FROM (
          SELECT 't1v150' AS view, attr, CAST(count(*) AS BIGINT) AS n
            FROM dim GROUP BY 1, 2
          UNION ALL
          SELECT 't2v50', attr, CAST(count(*) AS BIGINT) FROM dim GROUP BY 1, 2
          UNION ALL
          SELECT 't2v150', CASE WHEN key % 3 = 0 THEN 'MOVED' ELSE attr END,
            CAST(count(*) AS BIGINT)
            FROM dim GROUP BY 1, 2)
        ORDER BY view, attr""")),

    QueryDef("op_lpm_join",
      // longest-prefix match: derived 32-bit keys against a 100-route
      // CIDR table — equi-join on (len, bucket) with per-key argmax
      // length (see Joins.longestPrefixMatch), per-route census out
      (s, d) => {
        val ips = t(s, d, "events")
          .select((col("user_id") * 2654435761L % 4294967296L).as("ip")).distinct()
        // network is the RAW 32-bit address — longestPrefixMatch masks the
        // host bits itself (the route side shifts by 32 − plen in-op)
        val routes = t(s, d, "customer").where(col("c_custkey") < 100)
          .select(col("c_custkey").as("rid"),
            (lit(8) + col("c_custkey") * 13 % 17).as("plen"),
            expr("(c_custkey * 40503103) % 4294967296").as("network"))
        Joins.longestPrefixMatch(ips, col("ip"), routes,
            col("network"), col("plen"), col("rid"))
          .groupBy(col("route_id"))
          .agg(max(col("plen")).as("plen"), count(lit(1)).as("n_ips"))
          .orderBySmall(col("route_id"))
      },
      Some("""WITH ips AS (SELECT DISTINCT (user_id * 2654435761) % 4294967296 AS key FROM events),
        routes AS (SELECT c_custkey AS rid,
            8 + (c_custkey * 13) % 17 AS plen,
            (c_custkey * 40503103) % 4294967296 AS network
          FROM customer WHERE c_custkey < 100),
        cand AS (SELECT i.key, r.rid, r.plen FROM ips i JOIN routes r
          ON i.key // (CAST(1 AS BIGINT) << (32 - r.plen)) =
             r.network // (CAST(1 AS BIGINT) << (32 - r.plen))),
        best AS (SELECT key, rid, plen,
            row_number() OVER (PARTITION BY key ORDER BY plen DESC, rid ASC) AS rn
          FROM cand)
        SELECT rid AS route_id, CAST(max(plen) AS INTEGER) AS plen,
          CAST(count(*) AS BIGINT) AS n_ips
        FROM best WHERE rn = 1 GROUP BY 1 ORDER BY 1""")),

    QueryDef("txt_kneser_ney",
      // interpolated Kneser-Ney bigram LM over the corpus — exact with
      // D = 3/4 (see TextAnalysis.knBigramProbs): integer numerator/
      // denominator over a common base, one IEEE division per bigram
      (s, d) => TextAnalysis.knBigramProbs(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("x"), col("y")),
      Some("""WITH tk AS (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), t -> len(t) > 0) AS toks
          FROM documents),
        occ AS (SELECT split_part(gram, ' ', 1) AS x, split_part(gram, ' ', -1) AS y
          FROM (SELECT unnest([toks[i] || ' ' || toks[i+1]
              FOR i IN generate_series(1, len(toks) - 1)]) AS gram
            FROM tk WHERE len(toks) >= 2)),
        cxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM occ GROUP BY 1, 2),
        cx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x, CAST(count(*) AS BIGINT) AS n1_x
          FROM cxy GROUP BY 1),
        n1y AS (SELECT y, CAST(count(*) AS BIGINT) AS n1_y FROM cxy GROUP BY 1),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM cxy)
        SELECT cxy.x, cxy.y, c_xy,
          CAST(greatest(c_xy * 4 - 3, 0)::HUGEINT * ntot + (n1_x * 3)::HUGEINT * n1_y AS DOUBLE) /
            CAST((c_x * 4)::HUGEINT * ntot AS DOUBLE) AS p_kn
        FROM cxy JOIN cx USING (x) JOIN n1y USING (y) CROSS JOIN nt
        ORDER BY cxy.x, cxy.y""")),

    QueryDef("ml_pr_curve",
      // the full precision-recall curve at every distinct threshold
      // (ml_auc's construct, curve instead of scalar): exact integer
      // TP/FP/FN from one descending cumsum over the bounded score
      // census, shares in millionths
      (s, d) => {
        val f = t(s, d, "documents").select(
          ((col("doc_id") * 37) % 71 +
            when(col("doc_id") % 3 === 0, 30).otherwise(0)).as("score"),
          when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("y"))
        MlEval.prCurve(f, col("score"), col("y"))
          .orderBySmall(col("threshold").desc)
      },
      Some("""WITH f AS (SELECT (doc_id*37) % 71 + CASE WHEN doc_id%3=0 THEN 30 ELSE 0 END AS s,
            CASE WHEN doc_id%3=0 THEN 1 ELSE 0 END AS y FROM documents),
        c AS (SELECT s AS threshold, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
          FROM f GROUP BY 1),
        m AS (SELECT threshold,
            CAST(sum(pos) OVER (ORDER BY threshold DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
            CAST(sum(n) OVER (ORDER BY threshold DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pp,
            CAST(sum(pos) OVER () AS BIGINT) AS ptot
          FROM c)
        SELECT threshold, tp, pp - tp AS fp, ptot - tp AS fn,
          CAST(1000000 * tp // pp AS BIGINT) AS precision_millionths,
          CAST(CASE WHEN ptot > 0 THEN 1000000 * tp // ptot END AS BIGINT) AS recall_millionths
        FROM m ORDER BY threshold DESC""")),

    QueryDef("txt_mojibake",
      // double-encoding (mojibake) detection — the web-corpus cleaning
      // signal: UTF-8-read-as-latin1 plants 'Ã'/'â€' marker sequences.
      // Markers are planted deterministically (%13 docs get a corrupted
      // tail) and censused per source with pure string expressions
      (s, d) => {
        val planted = t(s, d, "documents").select(col("source"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" cafÃ© â€” naÃ¯ve")))
            .otherwise(col("text")).as("text"))
        planted.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(instr(col("text"), "Ã") > 0 || instr(col("text"), "â€") > 0, 1L)
              .otherwise(0L)).as("n_mojibake_docs"),
            sum((length(col("text")) -
              length(expr("replace(text, 'Ã', '')"))).cast("long")).as("n_marker_chars"))
          .orderBySmall(col("source"))
      },
      Some("""WITH p AS (SELECT source,
            CASE WHEN doc_id % 13 = 0 THEN text || ' cafÃ© â€” naÃ¯ve' ELSE text END AS text
          FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN strpos(text, 'Ã') > 0 OR strpos(text, 'â€') > 0
            THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake_docs,
          CAST(sum(length(text) - length(replace(text, 'Ã', ''))) AS BIGINT) AS n_marker_chars
        FROM p GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_gzip_jsonl_source",
      // compressed-text ingest, the web-corpus landing shape (Common
      // Crawl WET/JSONL is gzip): write documents as gzip JSON-lines
      // through the REAL codec, read back with an EXPLICIT schema (no
      // inference pass — one scan job, exact types), aggregate; the
      // oracle aggregates the original table, so a codec, escaping, or
      // type-mapping bug anywhere in the roundtrip breaks the hash
      (s, d) => {
        val dir = scratchDir("gzjsonl", d)
        t(s, d, "documents")
          .select(to_json(struct(col("doc_id"), col("source"), col("n_chars"))).as("value"))
          .write.mode("overwrite").option("compression", "gzip").text(s"$dir/jl")
        s.read.schema("doc_id LONG, source STRING, n_chars LONG")
          .json(s"$dir/jl")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_hierarchy_flatten",
      // WITH RECURSIVE, Spark-style: root + depth for every node of the
      // binary-heap forest over customer keys (parent = (node−1) div 2;
      // two roots: 0 and the planted second tree at the top key), via
      // log-round pointer doubling. The oracle IS a recursive CTE —
      // DuckDB walks per level, the engine doubles, results must agree.
      (s, d) => {
        val nodes = t(s, d, "customer").select(col("c_custkey").as("node"),
          when(col("c_custkey") === 0, lit(null).cast("long"))
            .otherwise(expr("(c_custkey - 1) div 2")).as("parent"))
        Analytics.hierarchyFlatten(nodes, "node", "parent")
          .select(col("node"), col("root"), col("depth"))
          .orderBy(col("node"))
      },
      Some("""WITH RECURSIVE t AS (
          SELECT c_custkey AS node,
            CASE WHEN c_custkey = 0 THEN NULL ELSE (c_custkey - 1) // 2 END AS parent
          FROM customer),
        r AS (
          SELECT node, node AS root, CAST(0 AS BIGINT) AS depth FROM t WHERE parent IS NULL
          UNION ALL
          SELECT t.node, r.root, r.depth + 1 FROM t JOIN r ON t.parent = r.node)
        SELECT node, root, depth FROM r ORDER BY node""")),

    QueryDef("op_sql_surface",
      // the engine's SQL-facing API end to end: temp views + PURE
      // spark.sql text driving the registered graft_* scalar functions
      // (cosine kernel, C4 stats kernel, haversine) — what a SQL-only
      // user of the library runs. Every value is floored-integer or
      // exactly-rounded, so the DuckDB mirror replays it bit for bit.
      (s, d) => {
        graft.plans.Graft.install(s)
        t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("v"))
          .where(col("vec_id") < 64).createOrReplaceTempView("g_emb")
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .where(col("doc_id") < 64).createOrReplaceTempView("g_docs")
        s.sql("""
          SELECT a.vec_id,
            CAST(floor(graft_cosine_sim(a.v, b.v) * 1000000) AS BIGINT) AS cos_next_micro,
            element_at(graft_c4_stats(d.text), 2) AS n_words,
            CAST(floor(graft_haversine_km(
              (a.vec_id * 7 % 1200) / 10.0 - 60.0, (a.vec_id * 13 % 3000) / 10.0 - 150.0,
              (b.vec_id * 91 % 1200) / 10.0 - 60.0, (b.vec_id * 53 % 3000) / 10.0 - 150.0
            ) * 1000) AS BIGINT) AS dist_milli
          FROM g_emb a
          JOIN g_emb b ON b.vec_id = a.vec_id + 1
          JOIN g_docs d ON d.doc_id = a.vec_id
          ORDER BY a.vec_id""")
      },
      Some(s"""WITH $latticeBaseCte,
        e AS (SELECT vec_id, v FROM base WHERE vec_id < 64)
        SELECT a.vec_id,
          CAST(floor((${cosSql("a.v", "b.v")}) * 1000000) AS BIGINT) AS cos_next_micro,
          CAST(len(list_filter(string_split_regex(d.text, '\\s+'), x -> len(x) > 0)) AS BIGINT)
            AS n_words,
          CAST(floor(${havSql(
            "((a.vec_id * 7 % 1200) / 10.0 - 60.0)", "((a.vec_id * 13 % 3000) / 10.0 - 150.0)",
            "((b.vec_id * 91 % 1200) / 10.0 - 60.0)", "((b.vec_id * 53 % 3000) / 10.0 - 150.0)")} * 1000)
            AS BIGINT) AS dist_milli
        FROM e a
        JOIN e b ON b.vec_id = a.vec_id + 1
        JOIN (SELECT doc_id, text FROM documents WHERE doc_id < 64) d ON d.doc_id = a.vec_id
        ORDER BY a.vec_id""")),

    QueryDef("op_mask_referential",
      // referentially-consistent pseudonymization (the governance op that
      // lets masked data still JOIN): name → 'C' + md5-prefix pseudonym,
      // deterministic so every occurrence masks identically. The audit
      // proves both properties the op exists for: per segment, distinct
      // pseudonyms == distinct originals (injective on this corpus — a
      // collision would break analysis joins) and an order-independent
      // digest over the pseudonym set the oracle reproduces from the raw
      // names. One aggregation; masking itself is a pure codegen
      // projection at ANY scale.
      (s, d) => {
        val masked = t(s, d, "customer").select(col("c_mktsegment"),
          col("c_custkey"), col("c_name"),
          concat(lit("C"), substring(md5(col("c_name")), 1, 12)).as("pseudonym"))
        masked.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("c_name")).as("n_names"),
            countDistinct(col("pseudonym")).as("n_pseudonyms"),
            // 48-bit terms summed in DECIMAL(38,0) (mirrors HUGEINT), emitted
            // as a digit STRING: a BIGINT sum wraps near 32k rows/group on
            // the Spark side while DuckDB's HUGEINT->BIGINT cast would
            // throw — the tableChecksum dtype discipline
            sum(conv(substring(md5(col("pseudonym")), 1, 12), 16, 10)
              .cast("decimal(38,0)")).cast("string").as("pseudonym_digest"))
          .orderBySmall(col("c_mktsegment"))
      },
      Some("""WITH m AS (SELECT c_mktsegment, c_name,
            'C' || substring(md5(c_name), 1, 12) AS pseudonym FROM customer)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(DISTINCT c_name) AS BIGINT) AS n_names,
          CAST(count(DISTINCT pseudonym) AS BIGINT) AS n_pseudonyms,
          CAST(sum(('0x' || substring(md5(pseudonym), 1, 12))::BIGINT) AS VARCHAR)
            AS pseudonym_digest
        FROM m GROUP BY 1 ORDER BY 1""")),

    QueryDef("op_column_encryption",
      // column-level encryption lifecycle through Spark's REAL AES path
      // (deterministic ECB + PKCS for oracle-ability; GCM's random IV is
      // the production default but non-replayable): encrypt names,
      // decrypt them back, and prove the roundtrip with an
      // order-independent digest over the DECRYPTED values that the
      // oracle computes from the raw names — a key, padding, or charset
      // bug anywhere in the crypto path breaks the hash.
      (s, d) => {
        val key = "0123456789abcdef" // 16-byte demo key; prod: per-column KMS
        val enc = t(s, d, "customer").select(col("c_mktsegment"),
          expr(s"aes_encrypt(c_name, '$key', 'ECB', 'PKCS')").as("enc"))
        val dec = enc.select(col("c_mktsegment"),
          expr(s"CAST(aes_decrypt(enc, '$key', 'ECB', 'PKCS') AS STRING)").as("name_back"))
        dec.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(col("name_back")), 1, 12), 16, 10)
              .cast("decimal(38,0)")).cast("string").as("roundtrip_digest"))
          .orderBySmall(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(('0x' || substring(md5(c_name), 1, 12))::BIGINT) AS VARCHAR)
            AS roundtrip_digest
        FROM customer GROUP BY 1 ORDER BY 1""")),

    {
      // closed-form MULTIVARIATE OLS (price ~ quantity + discount%) by
      // Cramer's rule on exact decimal moments; determinant trees shared
      // structurally between engines (det3 / det3Sql) so the float
      // evaluation order cannot drift
      val dA = det3Sql(Seq(Seq("n", "s1", "s2"), Seq("s1", "s11", "s12"), Seq("s2", "s12", "s22")))
      val d0 = det3Sql(Seq(Seq("sy", "s1", "s2"), Seq("s1y", "s11", "s12"), Seq("s2y", "s12", "s22")))
      val d1 = det3Sql(Seq(Seq("n", "sy", "s2"), Seq("s1", "s1y", "s12"), Seq("s2", "s2y", "s22")))
      val d2 = det3Sql(Seq(Seq("n", "s1", "sy"), Seq("s1", "s11", "s1y"), Seq("s2", "s12", "s2y")))
      QueryDef("ml_ols_multi",
        (s, d) => Analytics.ols2(t(s, d, "lineitem"),
          col("l_quantity"),
          expr("CAST(floor(l_discount * 100 + 0.5) AS INT)"),
          col("l_extendedprice"), yScale = 2),
        Some(s"""WITH src AS (SELECT l_quantity AS x1,
            CAST(floor(l_discount * 100 + 0.5) AS INTEGER) AS x2,
            l_extendedprice AS yy FROM lineitem),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
            CAST(sum(CAST(x1 AS DECIMAL(18,0))) AS DOUBLE) AS s1,
            CAST(sum(CAST(x2 AS DECIMAL(18,0))) AS DOUBLE) AS s2,
            CAST(sum(CAST(x1 * x1 AS DECIMAL(20,0))) AS DOUBLE) AS s11,
            CAST(sum(CAST(x1 * x2 AS DECIMAL(20,0))) AS DOUBLE) AS s12,
            CAST(sum(CAST(x2 * x2 AS DECIMAL(20,0))) AS DOUBLE) AS s22,
            CAST(sum(CAST(yy AS DECIMAL(24,2))) AS DOUBLE) AS sy,
            CAST(sum(CAST(x1 * yy AS DECIMAL(28,2))) AS DOUBLE) AS s1y,
            CAST(sum(CAST(x2 * yy AS DECIMAL(28,2))) AS DOUBLE) AS s2y
          FROM src),
          mv AS (SELECT n_rows, CAST(n_rows AS DOUBLE) AS n,
            s1, s2, s11, s12, s22, sy, s1y, s2y FROM mm)
        SELECT n_rows,
          CASE WHEN $dA <> 0 THEN $d0 / $dA END AS b0,
          CASE WHEN $dA <> 0 THEN $d1 / $dA END AS b1,
          CASE WHEN $dA <> 0 THEN $d2 / $dA END AS b2
        FROM mv"""))
    },

    QueryDef("ann_index_incremental",
      // INCREMENTAL index maintenance (dedup_incremental's shape for
      // vectors): fit centroids on the HISTORY half only, store its
      // assignments; a new batch is assigned with the FROZEN centroids
      // and APPENDED to the same cluster-partitioned table — no refit, no
      // history rewrite (the production steady state: refits are rare
      // compaction events, appends are the every-batch path). Queries
      // then probe the combined index. The oracle fits over the history
      // subset and assigns everything with those frozen centroids —
      // bit-identical by the lattice contract.
      (s, d) => {
        val dir = scratchDir("ivfinc", d)
        val e = t(s, d, "embeddings").select(col("vec_id"), latticeVec.as("embedding"))
        val hist = e.where(col("vec_id") % 2 === 0)
        val batch = e.where(col("vec_id") % 2 === 1)
        val cents = Similarity.kmeansFit(hist, "vec_id", "embedding",
          k = 16, iters = 3, seedKey = c => md5(c.cast("string")))
        hist.withColumn("cluster", Similarity.nearestCentroid(col("embedding"), cents))
          .write.mode("overwrite").partitionBy("cluster").parquet(s"$dir/assign")
        batch.withColumn("cluster", Similarity.nearestCentroid(col("embedding"), cents))
          .write.mode("append").partitionBy("cluster").parquet(s"$dir/assign")
        val corpus = s.read.parquet(s"$dir/assign")
        Similarity.ivfTopKFitted(corpus.where(annQueryPred), corpus,
            "vec_id", "embedding", "cluster", k = 5, nprobe = 4, cents)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        hist AS (SELECT vec_id, v FROM base WHERE vec_id % 2 = 0),
        ${kmeansCtesSql(k = 16, iters = 3, src = "hist")},
        lab AS (SELECT vec_id, v, j AS lbl FROM (
            SELECT b.vec_id, b.v, c.j,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM base b CROSS JOIN c3 c) WHERE rn = 1),
        cent AS (SELECT j AS lbl, c FROM c3),
        ${ivfTailSql("lab", "lbl", nprobe = 4)}""")),

    QueryDef("dedup_minhash_recall",
      // the DEDUP evaluation harness (ann_recall_at_k's pattern for
      // near-dup): over a BOUNDED doc sample (constant cardinality at any
      // SF — the ground-truth side is |sample|²-bounded by construction,
      // never corpus-quadratic), the exact shingle-sharing pair set
      // (complete for jaccard > 0: any qualifying pair shares a shingle)
      // vs the banded minhash pipeline's verified pairs. Verified found ⊆
      // exact, so recall isolates exactly the banding misses — the number
      // an LSH tuning loop (bands × rows trade) actually monitors.
      (s, d) => {
        val base = t(s, d, "documents")
          .where(col("doc_id") % 5 === 0 && col("doc_id") < 2048)
          .select(col("doc_id"), col("text"))
        // plant one near-dup per sampled doc (tail-perturbed copy) so the
        // ground-truth pair set is non-vacuous at every SF — the corpus'
        // natural word-salad rarely crosses the 0.1 jaccard bar
        val sample = base.unionByName(base.select(
          (col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" closing boilerplate line appended")).as("text")))
        val sh = Dedup.shingleTable(sample, "doc_id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
        val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
        val candAll = a.join(b.hint("merge"), Seq("shingle"))
          .where(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val exact = Dedup.jaccardVerify(candAll, sh, "doc_id", 0.1)
          .select("doc_a", "doc_b")
        val found = Dedup.minhashNearDupPairsFromShingles(sh, "doc_id",
            numHashes = 8, rowsPerBand = 2, threshold = 0.1)
          .select("doc_a", "doc_b")
        val missed = exact.join(found, Seq("doc_a", "doc_b"), "left_anti")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(found.agg(count(lit(1)).as("n_found")))
          .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
          .select(col("n_exact"), col("n_found"), col("n_missed"),
            expr("CAST(CASE WHEN n_exact > 0 THEN 1000000 * n_found div n_exact END AS BIGINT)")
              .as("recall_millionths"))
      },
      Some(minhashRecallOracleSql(shingleN = 3, numHashes = 8, rowsPerBand = 2,
        threshold = 0.1))),

    QueryDef("op_mann_whitney",
      // nonparametric two-sample test: does quantity distribute
      // differently across linestatus F vs O? Exact doubled-midrank
      // algebra over the bounded quantity domain; only z is float (one
      // fixed IEEE expression sequence — see mannWhitney's scaladoc)
      (s, d) => Analytics.mannWhitney(t(s, d, "lineitem"),
        col("l_quantity"), col("l_linestatus") === "F"),
      Some("""WITH cells AS (SELECT l_quantity AS v,
            CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
            CAST(count(*) AS BIGINT) AS ct
          FROM lineitem GROUP BY 1),
        ranked AS (SELECT ca, ct,
            coalesce(CAST(sum(ct) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
          FROM cells),
        m AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(ct) AS BIGINT) AS n,
            sum(ca::HUGEINT * (below * 2 + ct + 1)) AS r1x2,
            sum(ct::HUGEINT * ct * ct - ct) AS ties
          FROM ranked),
        s1 AS (SELECT n1, n - n1 AS n2, n, r1x2, ties FROM m),
        s2 AS (SELECT n1, n2,
            n1::HUGEINT * n2 * 2 + n1::HUGEINT * (n1 + 1) - r1x2 AS u1x2,
            n1::HUGEINT * n2 * ((n + 1)::HUGEINT * n * (n - 1) - ties) AS v12,
            n
          FROM s1)
        SELECT n1, n2, CAST(u1x2 AS DOUBLE) AS u1_x2,
          CASE WHEN v12 > 0 AND n1 > 0 AND n2 > 0 THEN
            (CAST(u1x2 - n1::HUGEINT * n2 AS DOUBLE) / 2) /
              sqrt(CAST(v12 AS DOUBLE) / CAST(12::HUGEINT * n * (n - 1) AS DOUBLE))
          END AS z
        FROM s2""")),

    QueryDef("mix_curriculum",
      // curriculum interleave: per-source difficulty rank (easy first,
      // key ties) — sorting by (rank, source, key) is the round-robin
      // schedule; no corpus-wide row_number is ever materialized
      (s, d) => Sampling.curriculumInterleave(t(s, d, "documents"),
          col("doc_id"), col("source"), col("n_chars"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("curriculum_rank"))
        .orderBy(col("curriculum_rank"), col("source"), col("doc_id")),
      Some("""SELECT doc_id, source, n_chars,
          CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS INTEGER)
            AS curriculum_rank
        FROM documents ORDER BY curriculum_rank, source, doc_id""")),

    QueryDef("op23_csv_roundtrip",
      // CSV staging-sink interchange (§2 op 23 — the reference stages
      // every extract as a CSV file, global_dag.py:57,67): write the
      // projected documents table through Sinks.csvSink, read it back
      // with an EXPLICIT schema (CSV is type-lossy; inference would
      // round-trip doc_id as string and break the hash), aggregate. The
      // oracle aggregates the ORIGINAL parquet, so a header, quoting, or
      // type-mapping bug anywhere in the encode/decode path diverges.
      (s, d) => {
        val dir = scratchDir("csvsink", d)
        Sinks.csvSink(t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars")), dir)
        s.read.option("header", "true")
          .schema("doc_id LONG, source STRING, n_chars LONG").csv(dir)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBySmall(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id
        FROM documents GROUP BY 1 ORDER BY 1""")),

    QueryDef("op25_ddl_create",
      // first-write DDL (§2 op 25 — create_death_table.sql:4-10 is the
      // reference's CREATE TABLE IF NOT EXISTS): the store is dropped up
      // front so the FIRST idempotentJdbcAppend must derive the DDL from
      // the batch schema and create the table; the SECOND append re-sends
      // an OVERLAPPING batch (all rows, first sent only even doc_ids) and
      // must insert exactly the unseen keys — ON CONFLICT DO NOTHING done
      // relationally. The read-back aggregate equals the distinct union
      // and the per-call insert counts are part of the hashed row, so a
      // skipped creation, a doubled insert, or a DDL type-mapping bug all
      // diverge from the oracle.
      (s, d) => {
        val dir = scratchDir("ddl", d)
        val url = s"jdbc:derby:$dir/db;create=true"
        val props = new java.util.Properties()
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        org.apache.spark.sql.GraftBridge.jdbcDropIfExists(url, "ddl_docs", props)
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val n1 = Sinks.idempotentJdbcAppend(s, docs.where(col("doc_id") % 2 === 0),
          url, "ddl_docs", Seq("doc_id"), props)
        val n2 = Sinks.idempotentJdbcAppend(s, docs, url, "ddl_docs",
          Seq("doc_id"), props)
        s.read.format("jdbc").option("url", url).option("dbtable", "ddl_docs")
          .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
          .agg(count(lit(1)).as("n_total"), sum(col("n_chars")).as("sum_chars"))
          .select(lit(n1).as("n_first"), lit(n2).as("n_second"),
            col("n_total"), col("sum_chars"))
      },
      Some("""SELECT (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS n_first,
          (SELECT count(*) FROM documents WHERE doc_id % 2 <> 0) AS n_second,
          count(*) AS n_total, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents""")),

    QueryDef("op21_branch_gate",
      // non-empty branch gate (§2 op 21 — the reference's
      // BranchPythonOperator skips the load when the extract came back
      // empty, global_dag.py:151-159): writeIfNonEmpty on a vacuously
      // empty filter must NOT write (the skip leg — asserted by probing
      // the sink path, folded into the hashed row), and on a non-empty
      // filter must write exactly the filtered rows; the read-back
      // aggregate ties the gate to real data so both legs are
      // oracle-checked in one key.
      (s, d) => {
        val dir = scratchDir("gate", d)
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        val skipped = dir + "/skipped"
        val taken = dir + "/taken"
        val wroteEmpty = Sinks.writeIfNonEmpty(docs.where(col("n_chars") < 0),
          _.write.mode("overwrite").parquet(skipped))
        val wroteTaken = Sinks.writeIfNonEmpty(docs.where(col("source") === "src0"),
          _.write.mode("overwrite").parquet(taken))
        val skipLegWrote = new java.io.File(skipped).exists()
        s.read.parquet(taken)
          .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"))
          .select(lit(wroteEmpty || skipLegWrote).as("empty_leg_wrote"),
            lit(wroteTaken).as("nonempty_leg_wrote"),
            col("n_rows"), col("sum_chars"))
      },
      Some("""SELECT false AS empty_leg_wrote, true AS nonempty_leg_wrote,
          count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents WHERE source = 'src0'""")),

    QueryDef("ann_ivf_bigk",
      // the LARGE-CELL-COUNT IVF routing path (ivfTopKFittedBigK):
      // centroids as a broadcast TABLE + bounded two-stage top-nprobe
      // probe selection, instead of ann_ivf_fit's literal expression
      // ranking — the plan that survives production cell counts
      // (10⁴–10⁶ cells) where a literal tree explodes Catalyst. Same
      // fit, same data, same (c_sim desc, cluster asc) probe order, SAME
      // ORACLE as ann_ivf_fit: the two routing paths must be
      // hash-identical, so a divergence in either is caught twice over.
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"),
          latticeVec.as("embedding"))
        val cents = Similarity.kmeansFit(e, "vec_id", "embedding",
          k = 16, iters = 3, seedKey = c => md5(c.cast("string")))
        val labeled = e.withColumn("cluster",
          Similarity.nearestCentroid(col("embedding"), cents))
        Similarity.ivfTopKFittedBigK(labeled.where(annQueryPred), labeled,
            "vec_id", "embedding", "cluster", k = 5, nprobe = 4, cents)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $latticeBaseCte,
        ${kmeansCtesSql(k = 16, iters = 3)},
        lab AS (SELECT vec_id, v, j AS lbl FROM (
            SELECT b.vec_id, b.v, c.j,
              row_number() OVER (PARTITION BY b.vec_id ORDER BY ${cosSql("b.v", "c.c")} DESC, c.j ASC) AS rn
            FROM base b CROSS JOIN c3 c) WHERE rn = 1),
        cent AS (SELECT j AS lbl, c FROM c3),
        ${ivfTailSql("lab", "lbl", nprobe = 4)}""")),

    QueryDef("emb_srp_recall",
      // SRP-LSH recall certification (the dedup_minhash_recall harness on
      // the EMBEDDING side): over a bounded sample, plant one near-dup per
      // vector (per-dim EXACT-arithmetic scale 1 + 0.02·((id+i)%7 − 3) —
      // no transcendentals, so both engines build bit-identical vectors;
      // the Kantorovich bound puts every planted cosine ≥ 0.998 while
      // naturals top out at 0.479, so ground truth is analytically the
      // planted pair set). Banding is DELIBERATELY weak — 2 tables, no
      // multiprobe — so recall is genuinely < 1 and the key MEASURES the
      // banding miss rate: the oracle replays the md5-derived ±1 planes
      // and the kernel's left-to-right double accumulation in SQL, so a
      // plane-derivation, bucketing, or verify bug shifts n_found and
      // breaks the hash.
      (s, d) => {
        val sample = t(s, d, "embeddings")
          .where(col("vec_id") % 5 === 0 && col("vec_id") < 2048)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        // the base id is renamed FIRST: in a single select, Spark's lateral
        // column alias resolution binds the lambda's vec_id to the negated
        // output alias, silently perturbing by the WRONG id (caught by this
        // key's own oracle during development)
        val pert = sample.select(col("vec_id").as("_bid"), col("embedding"))
          .select((-col("_bid") - 1).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x * (lit(1.0) + lit(0.02) * ((col("_bid") + i) % 7 - 3).cast("double")))
              .as("embedding"))
        val found = Similarity.embeddingNearDupPairs(sample.unionByName(pert),
          "vec_id", "embedding", numTables = 2, planesPerTable = 20,
          threshold = 0.9, probeRadius = 0)
        sample.agg(count(lit(1)).as("n_exact"))
          .crossJoin(found.agg(count(lit(1)).as("n_found")))
          .select(col("n_exact"), col("n_found"),
            (col("n_exact") - col("n_found")).as("n_missed"),
            // n_exact = 0 (empty bounded sample at a tiny SF) must yield
            // NULL on BOTH engines: Spark's div would return NULL but
            // DuckDB's // by zero ERRORS, so the guard keeps the failure
            // modes aligned instead of diverging
            expr("CASE WHEN n_exact > 0 THEN CAST(1000000 * n_found div n_exact AS BIGINT) END")
              .as("recall_millionths"))
      },
      Some("""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 2048),
        vecs AS (SELECT vec_id AS id, v FROM s
          UNION ALL SELECT -vec_id - 1,
            list_transform(v, (x, i) ->
              x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 7 - 3 AS DOUBLE)))
          FROM s),
        planes AS (SELECT t.t, p.p, d.d,
            CASE WHEN substr(md5(CAST(t.t * 1000 + p.p AS VARCHAR) || '_'
                || CAST(d.d AS VARCHAR)), 1, 1)
              IN ('1','3','5','7','9','b','d','f') THEN 1.0 ELSE -1.0 END AS sgn
          FROM range(2) t(t), range(20) p(p), range(64) d(d)),
        term AS (SELECT vv.id, pl.t, pl.p, pl.d, vv.v[pl.d + 1] * pl.sgn AS x
          FROM vecs vv CROSS JOIN planes pl),
        dots AS (SELECT id, t, p, list_reduce(list(x ORDER BY d), (a, b) -> a + b) AS dot
          FROM term GROUP BY id, t, p),
        bk AS (SELECT id, t,
            CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id, t),
        hit AS (SELECT DISTINCT b.id
          FROM bk b JOIN bk q ON q.id = -b.id - 1 AND q.t = b.t AND q.bucket = b.bucket
          WHERE b.id >= 0),
        tot AS (SELECT (SELECT count(*) FROM s) AS n_exact,
            (SELECT count(*) FROM hit) AS n_found)
        SELECT n_exact, n_found, n_exact - n_found AS n_missed,
          CASE WHEN n_exact > 0
            THEN CAST(1000000 * n_found // n_exact AS BIGINT) END AS recall_millionths
        FROM tot""")),

    QueryDef("emb_srp_recall_mp",
      // Hamming-radius-1 MULTIPROBE recall certification — emb_srp_recall's
      // harness (same planted pairs, same deliberately-weak 2-table
      // banding) measuring BOTH probe radii in one hashed row, so the
      // multiprobe recall lever is itself oracle-certified: probing each
      // bucket's k 1-bit neighbors on one join side (srpCandidatePairs'
      // probeRadius=1 path, the default in embeddingNearDupPairs) must
      // recover strictly more planted pairs than exact-bucket banding at
      // EQUAL table count — the cheaper alternative to adding tables
      // (k extra probe rows per (doc, table) vs a whole extra hash pass +
      // join leg per table). The oracle replays both regimes in SQL:
      // exact bucket equality, and bit_count(xor(...)) <= 1 — a probe
      // generation or band-join bug shifts n_found_r1 and breaks the hash.
      (s, d) => {
        val sample = t(s, d, "embeddings")
          .where(col("vec_id") % 5 === 0 && col("vec_id") < 2048)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val pert = sample.select(col("vec_id").as("_bid"), col("embedding"))
          .select((-col("_bid") - 1).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x * (lit(1.0) + lit(0.02) * ((col("_bid") + i) % 7 - 3).cast("double")))
              .as("embedding"))
        val all = sample.unionByName(pert)
        val found0 = Similarity.embeddingNearDupPairs(all,
          "vec_id", "embedding", numTables = 2, planesPerTable = 20,
          threshold = 0.9, probeRadius = 0)
        val found1 = Similarity.embeddingNearDupPairs(all,
          "vec_id", "embedding", numTables = 2, planesPerTable = 20,
          threshold = 0.9, probeRadius = 1)
        sample.agg(count(lit(1)).as("n_exact"))
          .crossJoin(found0.agg(count(lit(1)).as("n_found_r0")))
          .crossJoin(found1.agg(count(lit(1)).as("n_found_r1")))
          .select(col("n_exact"), col("n_found_r0"), col("n_found_r1"),
            (col("n_found_r1") - col("n_found_r0")).as("n_probe_gain"),
            expr("CASE WHEN n_exact > 0 THEN CAST(1000000 * n_found_r0 div n_exact AS BIGINT) END")
              .as("recall_r0_millionths"),
            expr("CASE WHEN n_exact > 0 THEN CAST(1000000 * n_found_r1 div n_exact AS BIGINT) END")
              .as("recall_r1_millionths"))
      },
      Some("""WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 2048),
        vecs AS (SELECT vec_id AS id, v FROM s
          UNION ALL SELECT -vec_id - 1,
            list_transform(v, (x, i) ->
              x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 7 - 3 AS DOUBLE)))
          FROM s),
        planes AS (SELECT t.t, p.p, d.d,
            CASE WHEN substr(md5(CAST(t.t * 1000 + p.p AS VARCHAR) || '_'
                || CAST(d.d AS VARCHAR)), 1, 1)
              IN ('1','3','5','7','9','b','d','f') THEN 1.0 ELSE -1.0 END AS sgn
          FROM range(2) t(t), range(20) p(p), range(64) d(d)),
        term AS (SELECT vv.id, pl.t, pl.p, pl.d, vv.v[pl.d + 1] * pl.sgn AS x
          FROM vecs vv CROSS JOIN planes pl),
        dots AS (SELECT id, t, p, list_reduce(list(x ORDER BY d), (a, b) -> a + b) AS dot
          FROM term GROUP BY id, t, p),
        bk AS (SELECT id, t,
            CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id, t),
        hit0 AS (SELECT DISTINCT b.id
          FROM bk b JOIN bk q ON q.id = -b.id - 1 AND q.t = b.t AND q.bucket = b.bucket
          WHERE b.id >= 0),
        hit1 AS (SELECT DISTINCT b.id
          FROM bk b JOIN bk q ON q.id = -b.id - 1 AND q.t = b.t
            AND bit_count(xor(b.bucket, q.bucket)) <= 1
          WHERE b.id >= 0),
        tot AS (SELECT (SELECT count(*) FROM s) AS n_exact,
            (SELECT count(*) FROM hit0) AS n_found_r0,
            (SELECT count(*) FROM hit1) AS n_found_r1)
        SELECT n_exact, n_found_r0, n_found_r1,
          n_found_r1 - n_found_r0 AS n_probe_gain,
          CASE WHEN n_exact > 0
            THEN CAST(1000000 * n_found_r0 // n_exact AS BIGINT) END AS recall_r0_millionths,
          CASE WHEN n_exact > 0
            THEN CAST(1000000 * n_found_r1 // n_exact AS BIGINT) END AS recall_r1_millionths
        FROM tot"""))
  )

  // ------------------------------------------------------------------
  // Programmatically generated oracle SQL for the hash-heavy dedup ops —
  // the SQL mirrors the Spark expressions definitionally (same md5 inputs,
  // same band layout, same ascii-nibble bit extraction).
  // ------------------------------------------------------------------

  /** Unrolled-CTE FIXED-POINT PageRank mirror (the ml_perceptron_quality
    * technique for iterative driver loops). Every operation is integer
    * floor division / multiplication / exact sum on non-negative scaled
    * longs — DuckDB `//` and Spark `div` agree exactly on non-negatives,
    * so the replay is bit-identical with no float anywhere. Sums are cast
    * back to BIGINT (DuckDB widens BIGINT sums to HUGEINT).
    */
  def pageRankOracleSql(iters: Int, mod: Int, dampNum: Long = 17L, dampDen: Long = 20L,
                        scale: Long = 1000000000000000L): String = {
    require(iters >= 1)
    val body = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.dst AS v, CAST(sum(p.pr // od.outdeg) AS BIGINT) AS s
        FROM edges e JOIN pr${k - 1} p ON p.v = e.src JOIN outdeg od ON od.src = e.src
        GROUP BY 1),
      pr$k AS (SELECT nodes.v,
          CAST(($scale - $scale * $dampNum // $dampDen) // nn.n
            + coalesce(c$k.s, 0) * $dampNum // $dampDen AS BIGINT) AS pr
        FROM nodes CROSS JOIN nn LEFT JOIN c$k ON c$k.v = nodes.v)"""
    }.mkString(",\n      ")
    s"""WITH edges AS (SELECT o_custkey % $mod AS src, o_orderkey % $mod AS dst FROM orders),
      nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
      nn AS (SELECT count(*) AS n FROM nodes),
      outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      pr0 AS (SELECT v, CAST($scale // nn.n AS BIGINT) AS pr FROM nodes CROSS JOIN nn),
      $body
      SELECT v, pr FROM pr$iters ORDER BY v"""
  }

  /** Unrolled-CTE FIXED-POINT HITS mirror ([[pageRankOracleSql]]'s
    * technique for the two-score recurrence): raw sums over edges, then
    * `x · scale // Σx` integer normalization per half-round — bit-exact
    * on non-negative longs in both engines.
    */
  def hitsOracleSql(iters: Int, mod: Int, scale: Long = 1000000L): String = {
    require(iters >= 1)
    val body = (1 to iters).map { k =>
      s"""ar$k AS (SELECT e.dst AS v, CAST(sum(h.h) AS BIGINT) AS x
        FROM edges e JOIN h${k - 1} h ON h.v = e.src GROUP BY 1),
      af$k AS (SELECT nodes.v, coalesce(ar$k.x, 0) AS x
        FROM nodes LEFT JOIN ar$k ON ar$k.v = nodes.v),
      as$k AS (SELECT CAST(sum(x) AS BIGINT) AS s FROM af$k),
      a$k AS (SELECT v, CAST(x * $scale // s AS BIGINT) AS a FROM af$k CROSS JOIN as$k),
      hr$k AS (SELECT e.src AS v, CAST(sum(a.a) AS BIGINT) AS x
        FROM edges e JOIN a$k a ON a.v = e.dst GROUP BY 1),
      hf$k AS (SELECT nodes.v, coalesce(hr$k.x, 0) AS x
        FROM nodes LEFT JOIN hr$k ON hr$k.v = nodes.v),
      hs$k AS (SELECT CAST(sum(x) AS BIGINT) AS s FROM hf$k),
      h$k AS (SELECT v, CAST(x * $scale // s AS BIGINT) AS h FROM hf$k CROSS JOIN hs$k)"""
    }.mkString(",\n      ")
    s"""WITH edges AS (SELECT o_custkey % $mod AS src, o_orderkey % $mod AS dst FROM orders),
      nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
      h0 AS (SELECT v, CAST($scale AS BIGINT) AS h FROM nodes),
      $body
      SELECT h$iters.v AS v, h$iters.h AS hub, a$iters.a AS authority
      FROM h$iters JOIN a$iters ON h$iters.v = a$iters.v ORDER BY h$iters.v"""
  }

  /** Unrolled-CTE deterministic LPA mirror: per round, neighbor-label
    * votes then argmax by (count desc, label asc) via row_number — the
    * same total order as the Spark side's max(struct(cnt, −label)).
    */
  def lpaOracleSql(rounds: Int, mod: Int): String = {
    require(rounds >= 1)
    val body = (1 to rounds).map { k =>
      s"""v$k AS (SELECT e.src AS v, l.label, count(*) AS cnt
        FROM sym e JOIN l${k - 1} l ON l.v = e.dst GROUP BY 1, 2),
      l$k AS (SELECT v, label FROM (
          SELECT v, label, row_number() OVER (PARTITION BY v ORDER BY cnt DESC, label) AS rr
          FROM v$k) WHERE rr = 1)"""
    }.mkString(",\n      ")
    s"""WITH edges AS (SELECT o_custkey % $mod AS src, o_orderkey % $mod AS dst FROM orders),
      sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
      nodes AS (SELECT DISTINCT src AS v FROM sym),
      l0 AS (SELECT v, v AS label FROM nodes),
      $body
      SELECT v, label AS community FROM l$rounds ORDER BY v"""
  }

  /** The shingle→signature→band CTE chain shared by every minhash oracle —
    * ONE source of the md5-slice arithmetic, so the self-pair and
    * incremental variants can never desynchronize from each other.
    */
  private def minhashCtePrefix(shingleN: Int, numHashes: Int, rowsPerBand: Int,
                               from: String): String = {
    val shingleExpr = (0 until shingleN).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    val mhCols = (0 until numHashes)
      .map(s => s"min(substring(md5(shingle), ${s * 4 + 1}, 4)) AS mh$s").mkString(", ")
    val numBands = numHashes / rowsPerBand
    val bandRows = (0 until numBands).map { b =>
      val cc = (0 until rowsPerBand).map(r => s"mh${b * rowsPerBand + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($cc) AS bucket FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH tk AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS toks
      FROM $from),
    shl AS (SELECT doc_id, [$shingleExpr FOR i IN generate_series(1, len(toks) - ${shingleN - 1})] AS shingles
      FROM tk WHERE len(toks) >= $shingleN),
    sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl),
    sig AS (SELECT doc_id, $mhCols FROM sh GROUP BY doc_id),
    buckets AS ($bandRows)"""
  }

  /** The candidate→verify tail shared by the minhash oracles: exact
    * Jaccard over full shingle sets for the `cand` CTE's (aCol, bCol)
    * pairs. The prefix must define `sh` and `cand`.
    */
  private def minhashVerifyTail(aCol: String, bCol: String, threshold: Double): String =
    s"""sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (SELECT c.$aCol, c.$bCol, count(*) AS n_inter
      FROM cand c JOIN sh sa ON sa.doc_id = c.$aCol JOIN sh sb ON sb.doc_id = c.$bCol AND sb.shingle = sa.shingle
      GROUP BY 1, 2)
    SELECT $aCol, $bCol,
      CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) AS jac
    FROM inter JOIN sizes za ON za.doc_id = $aCol JOIN sizes zb ON zb.doc_id = $bCol
    WHERE CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) >= $threshold
    ORDER BY $aCol, $bCol"""

  /** [[minhashOracleSql]] for the INCREMENTAL pairing: same shingle/
    * signature/band arithmetic (shared prefix), but candidates join the
    * history side's buckets against the incoming side's (doc_id parity
    * splits the documents table), never a self-join — mirroring
    * `Dedup.incrementalNearDupPairs` definitionally.
    */
  def minhashIncrementalOracleSql(shingleN: Int, numHashes: Int, rowsPerBand: Int,
                                  threshold: Double): String =
    s"""${minhashCtePrefix(shingleN, numHashes, rowsPerBand, "documents")},
    cand AS (SELECT DISTINCT n.doc_id AS doc_new, o.doc_id AS doc_old
      FROM buckets n JOIN buckets o ON n.band = o.band AND n.bucket = o.bucket
      WHERE n.doc_id % 2 = 1 AND o.doc_id % 2 = 0),
    ${minhashVerifyTail("doc_new", "doc_old", threshold)}"""

  def minhashOracleSql(shingleN: Int, numHashes: Int, rowsPerBand: Int, threshold: Double,
                       from: String = "documents"): String =
    s"""${minhashCtePrefix(shingleN, numHashes, rowsPerBand, from)},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    ${minhashVerifyTail("doc_a", "doc_b", threshold)}"""

  /** [[minhashOracleSql]]'s machinery turned into an EVALUATION mirror:
    * over a bounded doc sample, the exact shingle-sharing ground-truth
    * pair set and the banded (LSH) pair set are both verified with the
    * same exact-Jaccard tail, then reduced to the recall summary. Found ⊆
    * exact holds by construction (verified candidates that share a band
    * also share a shingle), so `n_missed` independently cross-checks
    * `n_exact − n_found`.
    */
  def minhashRecallOracleSql(shingleN: Int, numHashes: Int, rowsPerBand: Int,
                             threshold: Double): String =
    s"""${minhashCtePrefix(shingleN, numHashes, rowsPerBand,
        """(SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0 AND doc_id < 2048
           UNION ALL SELECT doc_id + 1000000, text || ' closing boilerplate line appended'
           FROM documents WHERE doc_id % 5 = 0 AND doc_id < 2048) samp""")},
    candb AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    cands AS (SELECT DISTINCT sa.doc_id AS doc_a, sb.doc_id AS doc_b
      FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    je AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter FROM cands c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2),
    exact AS (SELECT doc_a, doc_b FROM je
      JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) >= $threshold),
    jf AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter FROM candb c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2),
    found AS (SELECT doc_a, doc_b FROM jf
      JOIN sizes za ON za.doc_id = doc_a JOIN sizes zb ON zb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / CAST(za.n_sh + zb.n_sh - n_inter AS DOUBLE) >= $threshold),
    m AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
      (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found,
      (SELECT CAST(count(*) AS BIGINT) FROM exact e WHERE NOT EXISTS
        (SELECT 1 FROM found f WHERE f.doc_a = e.doc_a AND f.doc_b = e.doc_b)) AS n_missed)
    SELECT n_exact, n_found, n_missed,
      CAST(CASE WHEN n_exact > 0 THEN 1000000 * n_found // n_exact END AS BIGINT)
        AS recall_millionths
    FROM m"""

  def simhashOracleSql(maxHamming: Int): String = {
    // mirrors Dedup.simhash60 definitionally: same 15-hex-char (60-bit) md5
    // prefix, parsed once to a BIGINT ('0x…'::BIGINT == Spark's conv(…,16,10)),
    // same bit-sum rule. The oracle verifies by brute O(N²) scan — the Spark
    // side's chunk-bucketed join must produce the identical pair set.
    val bits = graft.ops.Dedup.SimhashBits
    val sums = (0 until bits).map { i =>
      s"CAST(sum(2 * ((h // ${1L << i}) % 2) - 1) AS BIGINT) AS s$i"
    }.mkString(", ")
    val hash = (0 until bits).map(i => s"CASE WHEN s$i >= 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""WITH tok0 AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS tokk
      FROM documents),
    tok AS (SELECT doc_id, ('0x' || substring(md5(tokk), 1, ${bits / 4}))::BIGINT AS h FROM tok0),
    sums AS (SELECT doc_id, $sums FROM tok GROUP BY doc_id),
    hashes AS (SELECT doc_id, CAST($hash AS BIGINT) AS simhash FROM sums)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
    ORDER BY doc_a, doc_b"""
  }
}
