package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's production analytics (SURVEY.md §3.3: Q-RADIUS,
  * Q-PLANT-DEATHS, Q-YEARLY, Q-HEATMAP) as generic operators, plus the
  * window/top-k/session surface the reference lacks (§2.7).
  */
object Analytics {

  /** Q-HEATMAP — density by grid cell: `groupBy(bin(x), bin(y)).count()`.
    * Uses floor-binning (exact on doubles) rather than round (whose tie
    * behavior differs across engines).
    */
  def heatmap(df: DataFrame, x: Column, y: Column, xBin: Double, yBin: Double): DataFrame =
    df.groupBy(
        floor(x / xBin).cast("long").as("cell_x"),
        floor(y / yBin).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("cnt"))

  /** Q-YEARLY — per-year counts with an "entity active since" predicate
    * (`year(event) >= active_year`), the slider analytic of the reference's
    * production plan.
    */
  def yearlyActive(df: DataFrame, eventDate: Column, activeYear: Column, groupCols: Seq[Column]): DataFrame =
    df.filter(year(eventDate) >= activeYear)
      .groupBy((year(eventDate).as("yr") +: groupCols): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Rank-within-partition top-n (deterministic: callers must pass a total
    * order). Plans as a single window over one shuffle of the input.
    */
  def rankTopN(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int, rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= n)
  }

  /** Gap-based sessionization in batch: a new session starts when the gap to
    * the previous event of the same key exceeds `gap` (in the units of the
    * numeric ts column). Session ids are a running sum of boundary flags —
    * one shuffle on the key.
    */
  def sessionizeNumeric(df: DataFrame, key: Column, tsNum: Column, gap: Long): DataFrame = {
    val Seq(flagN) = freshNames(df, "_new_session")
    val wOrd = Window.partitionBy(key).orderBy(tsNum.asc)
    val prev = lag(tsNum, 1).over(wOrd)
    val isNew = when(prev.isNull || tsNum - prev > gap, 1).otherwise(0)
    df.withColumn(flagN, isNew)
      .withColumn("session_id", sum(col(flagN)).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop(flagN)
  }

  /** Single-pass numeric data profile in long format: one row per column
    * with (n, n_null, min, max). The whole profile is ONE aggregate job —
    * 4·|cols| accumulators — not a scan per column.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"_nn_$c"),
        min(col(c)).cast("double").as(s"_mn_$c"),
        max(col(c)).cast("double").as(s"_mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"_n_$c").as("n"), col(s"_nn_$c").as("n_null"),
        col(s"_mn_$c").as("min_v"), col(s"_mx_$c").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Timestamp-typed convenience wrapper (second granularity). */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame =
    sessionizeNumeric(df, key, unix_timestamp(ts), gapSeconds)

  /** Ordered funnel analysis: per entity, how far through the stage
    * sequence it progressed, where stage k counts only if its FIRST
    * occurrence is strictly after stage k-1's first occurrence (the
    * standard conversion-funnel semantic). One conditional aggregation on
    * the entity key — a single shuffle, no joins, no re-scans per stage.
    * `tsNum` must be a numeric (e.g. integer-µs) event time.
    */
  def funnelStages(df: DataFrame, entity: Column, eventType: Column, tsNum: Column,
                   stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val firsts = df.groupBy(entity.as("entity"))
      .agg(min(when(eventType === stages.head, tsNum)).as("t0"),
        stages.tail.zipWithIndex.map { case (s, i) =>
          min(when(eventType === s, tsNum)).as(s"t${i + 1}")
        }: _*)
    // reached = length of the longest prefix with strictly increasing firsts
    val reached = stages.indices.tail.foldLeft(
        when(col("t0").isNotNull, lit(1)).otherwise(lit(0))) { (acc, i) =>
      when(acc === i && col(s"t${i - 1}") < col(s"t$i"), lit(i + 1)).otherwise(acc)
    }
    firsts.select(col("entity") +: (col("t0") +:
      stages.indices.tail.map(i => col(s"t$i")) :+ reached.as("reached")): _*)
  }

  /** Key-skew profile: the diagnostic to run BEFORE a big join or groupBy
    * at scale — per-key row counts reduced to the stats that predict
    * reducer imbalance (max/avg ratio ≈ straggler factor; the top-1 key's
    * share ≈ how much salting helps). One groupBy + one small aggregation;
    * heavy-hitter keys come back exactly, not via a sketch. The per-key
    * count table persists for its two consumers (stats + heaviest-key
    * filter); callers in long-lived sessions release it via
    * unpersist/clearCache.
    */
  def skewProfile(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"), max(col("n")).as("max_key_rows"))
    // heaviest key reported deterministically: the SMALLEST key among those
    // at the max count (ties broken the same way in any engine)
    counts.crossJoin(broadcast(stats))
      .where(col("n") === col("max_key_rows"))
      .groupBy(col("n_keys"), col("n_rows"), col("max_key_rows"))
      .agg(min(col("k")).as("heaviest_key"))
      .select(col("n_keys"), col("n_rows"), col("max_key_rows"), col("heaviest_key"),
        (col("max_key_rows").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double"))).as("skew_factor"))
  }

  /** Helper-column names that cannot collide with the input schema: prefix
    * underscores until the name is unused (also reserving against the other
    * fresh names minted in the same call). Collision checks are
    * case-INSENSITIVE, matching Spark's default column resolution — an
    * input column "_G" must still force "_g" to be renamed.
    */
  private def freshNames(df: DataFrame, bases: String*): Seq[String] = {
    val used = scala.collection.mutable.Set[String](df.columns.map(_.toLowerCase).toIndexedSeq: _*)
    bases.map { b =>
      var n = b
      while (used(n.toLowerCase)) n = "_" + n
      used += n.toLowerCase
      n
    }
  }

  /** Winsorization: clamp a measure into its per-group [pLo, pHi]
    * percentile band — the standard robust-stats outlier treatment. The
    * group percentile table is tiny (one row per group) and broadcast back.
    *
    * The percentiles are EXACT linear-interpolation quantiles computed by
    * RANK, not by the built-in `percentile` aggregate: that aggregate
    * buffers every (value, count) of a group inside one aggregation buffer,
    * which is unbounded memory on a single task at fact-table scale (and
    * was the single most expensive query in the round-4 bench). Here the
    * group is sorted once (spillable sort, one shuffle), each row learns
    * its row_number and group size from the same window pass, and the two
    * straddling rows per bound reduce in an ordinary hash aggregation. The
    * interpolation `(1−frac)·v_lo + frac·v_hi` is the built-in Percentile
    * aggregate's EXACT expression shape (`(higher−pos)·lower +
    * (pos−lower)·higher`; `1−frac` and `higher−pos` are bit-equal for
    * every reachable position), so clamped results are bit-identical to
    * the built-in — a PropertySpec invariant under random data.
    *
    * NULL measures are excluded from the percentile computation (matching
    * the built-in aggregate, which ignores nulls) and pass through with
    * `_wins` = NULL — `greatest`/`least` SKIP nulls, so without the
    * explicit guard a NULL measure would fabricate the low bound as its
    * clamped value. NULL groups are preserved (null-safe join), and a
    * group whose measures are all NULL gets NULL bounds, i.e. passes
    * through unclamped. Helper columns do not leak: the output is the
    * input schema plus `_wins`.
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
                pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0)
    // one ordered window spec for BOTH functions: row_number uses the running
    // frame, count an unbounded one, but sharing (partition, order) lets Spark
    // fuse them into a single WindowExec over a single spillable sort — the
    // unordered-count variant forced a second full Window pass
    val byGOrdered = Window.partitionBy(col("_g")).orderBy(col("_v"))
    val ranked = df.where(value.isNotNull)
      .select(group.as("_g"), value.cast("double").as("_v"))
      .withColumn("_rn", row_number().over(byGOrdered))
      .withColumn("_n", count(lit(1)).over(
        byGOrdered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // 0-based fractional position p·(n−1); k1 = 1-based index of the lower
    // straddling row, f = the interpolation fraction — per-group constants
    def pos(p: Double): Column = lit(p) * (col("_n") - 1).cast("double")
    def k1(p: Double): Column = floor(pos(p)).cast("long") + 1
    def frac(p: Double): Column = pos(p) - floor(pos(p))
    def interp(v: Column, v1: Column, f: Column): Column =
      (lit(1.0) - f) * v + f * coalesce(v1, v)
    val bounds = ranked
      .withColumn("_klo", k1(pLo)).withColumn("_flo", frac(pLo))
      .withColumn("_khi", k1(pHi)).withColumn("_fhi", frac(pHi))
      .groupBy(col("_g"))
      .agg(
        max(when(col("_rn") === col("_klo"), col("_v"))).as("_lo_v"),
        max(when(col("_rn") === col("_klo") + 1, col("_v"))).as("_lo_v1"),
        max(col("_flo")).as("_flo_c"),
        max(when(col("_rn") === col("_khi"), col("_v"))).as("_hi_v"),
        max(when(col("_rn") === col("_khi") + 1, col("_v"))).as("_hi_v1"),
        max(col("_fhi")).as("_fhi_c"))
      .select(col("_g"),
        interp(col("_lo_v"), col("_lo_v1"), col("_flo_c")).as("_lo"),
        interp(col("_hi_v"), col("_hi_v1"), col("_fhi_c")).as("_hi"))
    // the join side's column names are minted fresh against df.columns, so an
    // input that already contains `_g`/`_lo`/`_hi` neither turns the join
    // condition ambiguous nor loses a user column in the final drop (`_wins`
    // itself is the documented output column and replaces any same-named input)
    val Seq(gN, loN, hiN) = freshNames(df, "_g", "_lo", "_hi")
    val keyed = bounds.select(col("_g").as(gN), col("_lo").as(loN), col("_hi").as(hiN))
    df.join(broadcast(keyed), group <=> col(gN), "left")
      .withColumn("_wins",
        when(value.isNotNull, least(greatest(value, col(loN)), col(hiN))))
      .drop(gN, loN, hiN)
  }

  /** Per-group standardization (z-score) stats from EXACT moments — the
    * feature-scaling primitive. Like [[regressionByGroup]], Σx and Σx² are
    * DECIMAL sums (order-independent under partial aggregation), and
    * mean/std are then one shared IEEE double expression — bit-identical
    * across engines. Population std (`/n`). Returns one row per group:
    * (grp, n_rows, mean, std, n_outliers) where an outlier is
    * |x − mean| > zCut·std — an integer count, so the output stays
    * hash-comparable without emitting per-row doubles. `scale` must cover
    * the measure's true decimal width.
    *
    * Execution: two passes are semantically unavoidable (the outlier test
    * needs the group's mean/std), but when the group cardinality is at most
    * `maxLiteralGroups` the stats are pulled to the driver (a BOUNDED
    * collect) and inlined as literal CASE expressions, so each pass is one
    * job and the plan has no join or broadcast-build step. Above the bound
    * it degrades gracefully to the distributed broadcast-join form. The
    * default bound is deliberately modest: the literal fold evaluates an
    * O(groups) CASE chain per input row, so the 2-job win only beats the
    * join's O(1) hash probe while the chain stays small and codegen-
    * friendly — raise it only with measurement. NOTE: the driver probe
    * makes this operator EAGER (it submits a job when called, like
    * [[Similarity]]'s k-means fit), and the literal path requires the
    * group column to be a `lit()`-able atomic type.
    */
  def standardizeStats(df: DataFrame, group: Column, value: Column,
                       zCut: Double = 2.0, scale: Int = 2,
                       maxLiteralGroups: Int = 128, sqScale: Int = -1): DataFrame = {
    // sqScale caps the value² cast below 2·scale when the exact squared
    // sum would exceed ~15 significant digits — outside that window the
    // decimal→double conversion itself is engine-divergent (see
    // correlationMatrix.productScaleOverride); the capped quantized moment
    // converts exactly in both engines.
    // both passes run over the same fresh 2-column projection, so helper
    // names can never collide with (or drop) user columns
    val proj = df.select(group.as("grp"), value.as("_v"))
    val v = col("_v")
    val moments = proj.groupBy(col("grp"))
      .agg(
        // count(value), not count(*): the sums ignore NULL measures, so a
        // count over all rows would silently deflate mean/std for any
        // group containing NULLs (same exclusion winsorize applies)
        count(v).cast("double").as("_n"),
        sum(v.cast(s"decimal(24,$scale)")).cast("double").as("_s"),
        sum((v * v).cast(s"decimal(30,${if (sqScale >= 0) sqScale else 2 * scale})")).cast("double").as("_ss"))
      .select(col("grp"), col("_n"),
        (col("_s") / col("_n")).as("mean"),
        sqrt((col("_ss") - col("_s") * col("_s") / col("_n")) / col("_n")).as("std"))
    // The group-stats table is one row per group. For the common case
    // (bounded group cardinality — feature keys, flags, categories) it is
    // collected to the driver (coalesce(1) keeps the probe to ONE job; a
    // bare limit().collect() scale-up would submit up to log₄(partitions)
    // jobs) and folded into literal CASE expressions, making the outlier
    // pass a single self-contained aggregation: 1 job for the moments, 1
    // for the final agg, no broadcast-build job, no join. The collect is
    // BOUNDED by maxLiteralGroups + 1 rows; above the bound we fall back to
    // the distributed broadcast-join form (never an unbounded driver pull).
    // The literal path also requires a lit()-able group type — composite
    // keys (struct/array/map) always take the join path, like the old
    // implementation. Persisting moments makes the fallback reuse the
    // probe's aggregation instead of recomputing it (released by the
    // session's next clearCache, the skewProfile convention).
    val literalTyped = proj.schema("grp").dataType match {
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }
    val probeLimit = math.min(maxLiteralGroups.toLong + 1L, Int.MaxValue.toLong).toInt
    lazy val cachedMoments =
      moments.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head =
      if (literalTyped) cachedMoments.coalesce(1).limit(probeLimit).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (literalTyped && head.length <= maxLiteralGroups) {
      val nullD = lit(null).cast("double")
      val (meanE, stdE) = head.foldLeft((nullD, nullD)) { case ((mAcc, sAcc), r) =>
        val g = lit(r.get(0))
        (when(col("grp") <=> g, lit(r.get(2))).otherwise(mAcc),
         when(col("grp") <=> g, lit(r.get(3))).otherwise(sAcc))
      }
      proj.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(abs(v.cast("double") - meanE) > lit(zCut) * stdE, 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("grp"), col("n_rows"),
          meanE.cast("double").as("mean"), stdE.cast("double").as("std"),
          col("n_outliers"))
    } else {
      // composite-key groups or cardinality above the bound: distributed
      // broadcast-join form; cachedMoments serves the probe's aggregation
      // from cache when the probe ran (cardinality overflow), and is the
      // plain lazy plan when it didn't (composite keys, no probe paid)
      val m = (if (literalTyped) cachedMoments else moments)
        .select(col("grp").as("_mg"), col("mean"), col("std"))
      proj.join(broadcast(m), col("grp") <=> col("_mg"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"),
          max(col("mean")).as("mean"), max(col("std")).as("std"),
          sum(when(abs(v.cast("double") - col("mean")) > lit(zCut) * col("std"), 1L)
            .otherwise(0L)).as("n_outliers"))
    }
  }

  /** Distributed batch perceptron — the trainable half of a quality-
    * classifier curation stage (label a seed set, fit, filter the corpus
    * by prediction). Features and labels must be INTEGER-valued and the
    * label ±1; weights then stay integer (long) forever: each round's
    * update is w += Σ y·x over the currently-misclassified rows — ONE
    * aggregation job of long sums with map-side partials, EXACT in any
    * partition order, so the fit is bit-reproducible and replayable by an
    * external engine (no learning rate is needed: integer perceptron
    * updates are scale-free). The classic convergence guarantee applies:
    * for linearly separable data the loop reaches a separating plane in
    * finitely many rounds. Bias is the last weight (constant-1 feature).
    *
    * Like [[graft.ops.Similarity.kmeansFit]] this is an EAGER driver loop
    * (`iters` jobs); weights are metadata-sized and return as plain longs
    * for [[perceptronPredict]] to fold into a literal expression.
    *
    * OVERFLOW CONTRACT: everything is 64-bit long arithmetic, and Spark
    * wraps silently (non-ANSI) where an external oracle may widen — the
    * exactness claim holds only while every intermediate stays under 2⁶³:
    * |feature| ≤ F and n rows give per-round weight growth ≤ n·F and
    * margin magnitude ≤ d·(iters·n·F)·F, so keep features small-integer
    * (F ≲ 2¹⁰, e.g. bucketed/clipped scores) at web-scale row counts
    * rather than raw large-magnitude values.
    */
  def perceptronFit(df: DataFrame, features: Seq[Column], label: Column,
                    iters: Int): Array[Long] = {
    require(features.nonEmpty && iters >= 0)
    var w = Array.fill(features.length + 1)(0L)
    for (_ <- 1 to iters) {
      val margin = features.zipWithIndex
        .map { case (f, i) => f.cast("long") * lit(w(i)) }
        .reduce(_ + _) + lit(w.last)
      val mis = label.cast("long") * margin <= 0
      val aggs = (features.map(f => when(mis, label.cast("long") * f.cast("long"))) :+
          when(mis, label.cast("long")))
        .map(c => coalesce(sum(c), lit(0L)))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.indices.map(i => w(i) + r.getLong(i)).toArray
    }
    w
  }

  /** Sign prediction (+1 / −1) from [[perceptronFit]] weights as a pure
    * literal expression — applying the classifier to the full corpus is a
    * filter pass, no join, no shuffle.
    */
  def perceptronPredict(features: Seq[Column], w: Array[Long]): Column = {
    require(w.length == features.length + 1)
    val margin = features.zipWithIndex
      .map { case (f, i) => f.cast("long") * lit(w(i)) }
      .reduce(_ + _) + lit(w.last)
    when(margin > 0, lit(1)).otherwise(lit(-1))
  }

  /** Cohort retention matrix: entities are bucketed by the period of their
    * FIRST event (the cohort), and every event then counts its entity into
    * (cohort, periods-since-cohort). Two aggregations — first-event per
    * entity (map-side partial), then distinct entities per cell; the join
    * back is on the entity key and broadcasts when the entity dimension is
    * small. `tsNum` is numeric event time; `periodLen` the bucket width in
    * the same unit (e.g. 7·86400·10⁶ µs for weekly).
    */
  def cohortRetention(df: DataFrame, entity: Column, tsNum: Column,
                      periodLen: Long): DataFrame = {
    require(periodLen > 0)
    val ev = df.select(entity.as("entity"), tsNum.as("_ts"))
    val firsts = ev.groupBy(col("entity"))
      .agg(floor(min(col("_ts")) / periodLen).cast("long").as("cohort"))
    ev.join(firsts, "entity")
      .groupBy(col("cohort"),
        (floor(col("_ts") / periodLen).cast("long") - col("cohort")).as("periods_since"))
      .agg(count_distinct(col("entity")).as("n_entities"))
  }

  /** Pairwise Pearson correlation matrix over k numeric columns in ONE
    * aggregation pass — the feature-correlation audit a training-data
    * release runs before mixing signals. One agg computes every Σxᵢ and
    * Σxᵢxⱼ as EXACT decimal sums (order-independent partial aggregation,
    * same determinism argument as [[regressionByGroup]]), then the k(k−1)/2
    * correlations evaluate as identical IEEE double expression trees —
    * bit-reproducible where built-in `corr` per pair would both flake and
    * cost k² scans. Each input declares its true decimal scale; product
    * casts use the summed scales (see the boundary caution on
    * [[regressionByGroup]] — a product's double ulp must sit far below its
    * cast scale's half-step). Output long format: (col_a, col_b, corr).
    *
    * `productScaleOverride` caps a specific product's cast scale below
    * si+sj. This exists because the final decimal→double conversion is
    * only ENGINE-PORTABLE while the scaled sum stays under 2⁵³ (an exact
    * integer in double); a wide product like price² can push the exact sum
    * to 19 significant digits, where Spark's BigDecimal conversion and
    * DuckDB's hugeint path round the SAME value to different neighboring
    * doubles (measured: 1 ulp on Σprice² at sf0.1). Capping the scale
    * rounds each per-row product deterministically (positive half-ties
    * round away from zero in BOTH engines) and keeps the sum exactly
    * convertible — a quantized moment, identical everywhere, with relative
    * error ≤ rows·half-quantum / sum (~1e-10 here). Size caps so the
    * target-SF sum stays < 2⁵³, the same sizing note as
    * [[regressionByGroup]].
    */
  def correlationMatrix(df: DataFrame, inputs: Seq[(String, Int)],
                        productScaleOverride: Map[(String, String), Int] = Map.empty): DataFrame = {
    require(inputs.size >= 2, "need at least two columns to correlate")
    val n = count(lit(1)).cast("double").as("_n")
    val singles = inputs.indices.map { i =>
      val (c, sc) = inputs(i)
      sum(col(c).cast(s"decimal(24,$sc)")).cast("double").as(s"_s$i")
    }
    val products = for { i <- inputs.indices; j <- inputs.indices if i <= j } yield {
      val (ci, si) = inputs(i); val (cj, sj) = inputs(j)
      val sc = productScaleOverride.getOrElse((ci, cj), si + sj)
      sum((col(ci) * col(cj)).cast(s"decimal(30,$sc)")).cast("double").as(s"_p${i}_$j")
    }
    val m = df.agg(n, singles ++ products: _*)
    val rows = for { i <- inputs.indices; j <- inputs.indices if i < j } yield
      struct(lit(inputs(i)._1).as("col_a"), lit(inputs(j)._1).as("col_b"),
        ((col("_n") * col(s"_p${i}_$j") - col(s"_s$i") * col(s"_s$j")) /
          sqrt((col("_n") * col(s"_p${i}_$i") - col(s"_s$i") * col(s"_s$i")) *
               (col("_n") * col(s"_p${j}_$j") - col(s"_s$j") * col(s"_s$j")))).as("corr"))
    m.select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.corr"))
  }

  /** Per-group OLS regression (y = slope·x + intercept) and Pearson
    * correlation from EXACT moments: each Σx, Σy, Σxy, Σx², Σy² is a
    * decimal sum — order-independent under partial (map-side) aggregation,
    * so the result is identical however Spark schedules the merge — and
    * the closed-form formulas then run in IEEE doubles whose every op
    * (+,-,*,/,sqrt) is exactly rounded. The built-in `corr`/`regr_slope`
    * accumulate in floating point and give run-to-run different last bits
    * at scale; this form is bit-reproducible.
    *
    * Cast scales: `xScale`/`yScale` must cover the inputs' true decimal
    * widths, and the product scales (x·y, x², y²) are their sums. CAUTION:
    * a product's double ulp must sit well below its cast scale's half-step
    * (ulp(y²)≈2e-6 at 1e10), or the decimal rounding lands on engine-
    * dependent HALF_UP/HALF_EVEN boundaries. Precisions are sized for
    * ~1e9-row groups.
    */
  def regressionByGroup(df: DataFrame, group: Column, x: Column, y: Column,
                        xScale: Int = 0, yScale: Int = 2, yyScale: Int = -1): DataFrame = {
    // syy is the widest moment (Σy² reaches ~19 significant digits on fact
    // tables) and the decimal→double conversion is only engine-portable
    // while the SCALED sum stays under 2⁵³ — see correlationMatrix's
    // productScaleOverride note (measured 1-ulp Spark/DuckDB split past
    // that window). yyScale caps the y² cast (default: full 2·yScale);
    // per-row half-tie rounding agrees across engines on positives.
    val yySc = if (yyScale >= 0) yyScale else 2 * yScale
    val m = df.groupBy(group.as("grp"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x.cast(s"decimal(20,$xScale)")).cast("double").as("sx"),
        sum(y.cast(s"decimal(22,$yScale)")).cast("double").as("sy"),
        sum((x * y).cast(s"decimal(24,${xScale + yScale})")).cast("double").as("sxy"),
        sum((x * x).cast(s"decimal(24,${2 * xScale})")).cast("double").as("sxx"),
        sum((y * y).cast(s"decimal(26,$yySc)")).cast("double").as("syy"))
    m.select(col("grp"), col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
               (col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
      .select(col("grp"), col("n").cast("long").as("n_rows"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        col("corr"))
  }

  /** Equi-width histogram with FIXED bounds — the profiling primitive that
    * stays one map-side-combined aggregation at any SF (unlike quantile
    * binning, which needs a rank pass first). Bucket = ⌊(v − lo)/width⌋
    * clamped into [0, nBuckets): every step ((−), (/), floor, clamp) is an
    * exactly-rounded IEEE double op, so the bucket index is bit-identical
    * in any engine — no tie ambiguity even for values exactly on an edge.
    * NULL/NaN values are excluded (a NaN bucket would be engine-dependent).
    * Output: (bucket, lo_edge, n) — empty buckets are absent (the caller
    * left-joins a `sequence` grid if a dense axis is needed, as gapfill
    * does). lo_edge = lo + bucket·width recomputed from the index: exact,
    * and keeps the output independent of which rows landed in the bucket.
    */
  def histogramFixed(df: DataFrame, value: Column, lo: Double, width: Double,
                     nBuckets: Int): DataFrame = {
    require(width > 0 && nBuckets > 0)
    val v = value.cast("double")
    val bucket = least(greatest(floor((v - lit(lo)) / lit(width)), lit(0.0)),
      lit((nBuckets - 1).toDouble)).cast("int")
    df.where(v.isNotNull && !isnan(v))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket").cast("double") * lit(width)).as("lo_edge"),
        col("n"))
  }

  /** Certified quantile bounds from a fixed-grid histogram — the
    * mergeable, bounded-state way to answer percentile queries at corpus
    * scale: ONE map-side-combined aggregation builds the grid (state =
    * nBuckets counters, mergeable across executors and micro-batches), a
    * window cumsum over the BOUNDED bucket table locates each target
    * rank, and the answer is an interval [q_lo, q_hi) GUARANTEED to
    * contain the exact quantile, with deterministic error ≤ `width`.
    * Exact rank-based quantiles (madStats/winsorize) need a full shuffle
    * on the value; probabilistic sketches (t-digest/KLL) have
    * implementation-defined merge order — this is the middle path with a
    * certificate, same idea as heavyHittersCertified.
    *
    * Percentiles are INTEGER percents and the target rank is
    * ⌈p·N/100⌉ = (p·N + 99) div 100 in integer arithmetic — no float
    * rank anywhere. Values outside [lo, lo + width·nBuckets) land in
    * sentinel buckets −1/nBuckets; a quantile located there gets a NULL
    * open bound and `certified = false` — out-of-range data degrades the
    * answer honestly instead of silently clamping.
    *
    * Output per percent: (p, n_rows, rank, bucket, q_lo, q_hi,
    * certified).
    */
  def quantileGrid(df: DataFrame, value: Column, lo: Double, width: Double,
                   nBuckets: Int, percents: Seq[Int]): DataFrame = {
    require(width > 0 && nBuckets > 0 && percents.nonEmpty)
    require(percents.forall(p => p >= 1 && p <= 100))
    val v = value.cast("double")
    val hi = lo + width * nBuckets
    val bucket = when(v < lit(lo), lit(-1))
      .when(v >= lit(hi), lit(nBuckets))
      .otherwise(least(floor((v - lit(lo)) / lit(width)),
        lit((nBuckets - 1).toDouble)).cast("int"))
    val h = df.where(v.isNotNull && !isnan(v))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n"))
    // single-partition window + θ-join are over the BOUNDED bucket table
    // (≤ nBuckets+2 rows) — metadata-sized at any SF, never the data
    val cum = h.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val pexp = h.agg(sum(col("n")).as("n_total"))
      .select(col("n_total"), explode(array(percents.map(p => lit(p)): _*)).as("p"))
      .withColumn("target", expr("(p * n_total + 99) div 100"))
    pexp.join(cum, col("cum") >= col("target"))
      .groupBy(col("p"), col("target"), col("n_total"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("p"), col("n_total").as("n_rows"), col("target").as("rank"),
        col("bucket"),
        when(col("bucket") < 0, lit(null).cast("double"))
          .otherwise(lit(lo) + col("bucket").cast("double") * lit(width)).as("q_lo"),
        when(col("bucket") >= nBuckets, lit(null).cast("double"))
          .otherwise(lit(lo) + (col("bucket") + 1).cast("double") * lit(width)).as("q_hi"),
        (col("bucket") >= 0 && col("bucket") < nBuckets).as("certified"))
  }

  /** Data-quality expectation suite (Deequ-style) — ALL row-level checks in
    * ONE aggregation pass over the table: each check is a violation
    * predicate counted under the same `groupBy()`, so adding a check adds
    * zero scans and zero shuffles (the failure mode of naive quality
    * frameworks at 100 TB is one pass per rule). Returns the long-format
    * report (check, n_violations, n_rows, passed): integer counts only, so
    * the report is hash-stable, and `passed` is simply n_violations == 0.
    * Compose with [[uniquenessViolations]] / [[orphanCount]] (which need a
    * shuffle by nature) by unioning their report rows.
    */
  def expectations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.map { case (nm, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(s"_c_$nm")
    } :+ count(lit(1)).as("_n")
    val wide = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { case (nm, _) =>
      struct(lit(nm).as("check_name"), col(s"_c_$nm").as("n_violations"))
    }
    wide.select(explode(array(stacked: _*)).as("_e"), col("_n"))
      .select(col("_e.check_name").as("check_name"), col("_e.n_violations").as("n_violations"),
        col("_n").as("n_rows"), (col("_e.n_violations") === 0L).as("passed"))
  }

  /** Uniqueness expectation: rows whose `keys` tuple occurs more than once
    * (counting ALL members of a duplicated tuple, i.e. n − distinct would
    * under-report by one per clique). One hash aggregation on the key.
    */
  def uniquenessViolations(df: DataFrame, keys: Seq[Column], checkName: String): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("_k"))
      .groupBy()
      .agg(coalesce(sum(when(col("_k") > 1L, col("_k"))), lit(0L)).as("n_violations"),
        coalesce(sum(col("_k")), lit(0L)).as("n_rows"))
      .select(lit(checkName).as("check_name"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("passed"))

  /** Referential-integrity expectation: child rows whose `fk` has no match
    * in the parent's `pk` (NULL fks are not orphans — they are a
    * completeness check's business). Anti-join, broadcast-able when the
    * parent is a dimension; counted, never materialized.
    */
  def orphanCount(child: DataFrame, fk: Column, parent: DataFrame, pk: Column,
                  checkName: String): DataFrame = {
    val orphans = child.where(fk.isNotNull)
      .join(parent.select(pk.as("_pk")), fk === col("_pk"), "left_anti")
    val n = child.groupBy().agg(count(lit(1)).as("n_rows"))
    orphans.groupBy().agg(count(lit(1)).as("n_violations"))
      .crossJoin(n)
      .select(lit(checkName).as("check_name"), col("n_violations"), col("n_rows"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Rolling (sliding-frame) stats over an ordered per-key series — the
    * moving-average primitive. Frame = the current row and `nPreceding`
    * rows before it in `order` within `key`. The rolling sum is a DECIMAL
    * sum cast back to double: sliding-window engines are free to evaluate
    * the frame via segment trees (DuckDB) or incremental add/retract
    * (Spark), i.e. in DIFFERENT addition orders — decimal is the only
    * representation where that difference is invisible. One shuffle (the
    * window partition); `order` must be a total order within the key for
    * the result to be well-defined. Adds `roll_sum`, `roll_n`, `roll_avg`
    * (= exact sum / exact count, one correctly-rounded division).
    */
  def rollingStats(df: DataFrame, key: Column, order: Seq[Column], value: Column,
                   nPreceding: Int, scale: Int = 6): DataFrame = {
    require(nPreceding >= 0)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(-nPreceding.toLong, Window.currentRow)
    val d = value.cast(s"decimal(24,$scale)")
    df.withColumn("roll_sum", sum(d).over(w).cast("double"))
      .withColumn("roll_n", count(d).over(w))
      .withColumn("roll_avg", col("roll_sum") / col("roll_n").cast("double"))
  }

  /** Robust per-group outlier stats: median, MAD (median absolute
    * deviation), and the count of |x − median| > zCut·MAD — the
    * heavy-tail-safe alternative to [[standardizeStats]]'s mean/std (one
    * corrupt value moves a mean arbitrarily; it moves a median not at
    * all). Both medians are EXACT rank-interpolation quantiles computed by
    * window row_number + one hash aggregation per pass — the same
    * spillable-sort shape as [[winsorize]], never the built-in
    * `percentile`'s unbounded per-group buffer. Two rank passes are
    * semantically unavoidable (the deviation needs the group's median);
    * the tiny per-group median tables are broadcast back. Output:
    * (grp, n_rows, median, mad, n_outliers). NULL measures are excluded;
    * exactness of the outlier comparison is the CALLER's contract (integer
    * or low-scale-decimal measures make every interp/compare exact).
    */
  def madStats(df: DataFrame, group: Column, value: Column,
               zCut: Double = 3.0): DataFrame = {
    val meds = rankMedian(
      df.where(value.isNotNull).select(group.as("_g"), value.cast("double").as("_v")))
    val dev = df.where(value.isNotNull)
      .select(group.as("_g"), value.cast("double").as("_v"))
      .join(broadcast(meds.select(col("_g").as("_gm"), col("_q").as("_med"))),
        col("_g") <=> col("_gm"))
      .select(col("_g"), col("_v"), col("_med"), abs(col("_v") - col("_med")).as("_ad"))
    val mads = rankMedian(dev.select(col("_g"), col("_ad").as("_v")))
      .select(col("_g").as("_gd"), col("_q").as("_mad"))
    dev.join(broadcast(mads), col("_g") <=> col("_gd"))
      .groupBy(col("_g").as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("_med")).as("median"),
        max(col("_mad")).as("mad"),
        sum(when(col("_ad") > lit(zCut) * col("_mad"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Exact interpolated median per `_g` of `_v` via rank — (1−f)·v_lo +
    * f·v_hi with the straddling rows found by row_number, [[winsorize]]'s
    * expression shape at p = 0.5 (so f is 0.0 or 0.5 exactly).
    */
  private def rankMedian(pairs: DataFrame): DataFrame = {
    val byG = Window.partitionBy(col("_g"))
    val ranked = pairs
      .withColumn("_rn", row_number().over(byG.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over(byG))
    val pos = lit(0.5) * (col("_n") - 1).cast("double")
    val k1 = floor(pos).cast("long") + 1
    val frac = pos - floor(pos)
    ranked
      .withColumn("_k1", k1).withColumn("_f", frac)
      .groupBy(col("_g"))
      .agg(max(when(col("_rn") === col("_k1"), col("_v"))).as("_q0"),
        max(when(col("_rn") === col("_k1") + 1, col("_v"))).as("_q1"),
        max(col("_f")).as("_fc"))
      .select(col("_g"),
        ((lit(1.0) - col("_fc")) * col("_q0") +
          col("_fc") * coalesce(col("_q1"), col("_q0"))).as("_q"))
  }

  /** Contingency table with marginals — the χ²/mutual-information feed for
    * categorical feature association, kept ENTIRELY in integers so the
    * output is hash-stable and any statistic can be derived downstream
    * with controlled rounding (expected count = row_total·col_total /
    * n_total is exact rational arithmetic over these columns). One shuffle
    * (the cell groupBy); the marginal window sums run over the already-
    * aggregated cell table, which is bounded by |A|·|B|, not by SF.
    * Output: (a, b, n_obs, row_total, col_total, n_total).
    */
  def contingency(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("a"), b.as("b")).agg(count(lit(1)).as("n_obs"))
    cells
      .withColumn("row_total", sum(col("n_obs")).over(Window.partitionBy(col("a"))))
      .withColumn("col_total", sum(col("n_obs")).over(Window.partitionBy(col("b"))))
      .withColumn("n_total", sum(col("n_obs")).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
  }

  /** Distributed triangle count + global clustering coefficient over an
    * undirected edge list (self-loops dropped, duplicates and reversed
    * copies collapse). The classic two-join enumeration, made scale-safe
    * by DEGREE-ORDERED orientation: each edge is oriented from its lower
    * (degree, id) endpoint to its higher one — (degree, id) is already a
    * total order, so NO global rank sort (and no single-partition window)
    * exists anywhere in the plan; the orientation is decided edge-locally
    * after two degree-lookup joins. Out-degree under this orientation is
    * O(√E) even on power-law graphs — the candidate-path join is
    * Σ outdeg² ≈ E^1.5 worst case instead of the hub-quadratic Σ deg² of
    * naive id-ordering (Suri & Vassilvitskii's MR-friendly orientation).
    * Each triangle has exactly one ascending labeling under the total
    * order, so the path⋈edge join counts it exactly once.
    *
    * Shuffles: edge canonicalize+distinct (1), degree agg (1), two
    * degree-lookup joins, then path⋈edge — every exchange
    * hash-partitions; nothing is globally sorted or single-tasked.
    * Wedges come from the undirected degrees (Σ d·(d−1) div 2 —
    * INTEGRAL division: the double-valued `/` would round past 2⁵³ on
    * power-law hub degrees); the clustering coefficient 3·T/W is the one
    * double division.
    *
    * Output: one row (n_vertices, n_edges, n_wedges, n_triangles,
    * clustering).
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val (e0, deg) = canonicalEdgesWithDegrees(edges, srcCol, dstCol)
    val tri = orientedTriangleRows(e0, deg).agg(count(lit(1)).as("n_triangles"))
    val counts = deg.agg(
      count(lit(1)).as("n_vertices"),
      expr("sum(d) div 2").as("n_edges"),
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    counts.crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          (col("n_triangles") * 3).cast("double") / col("n_wedges").cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  private def canonicalEdgesWithDegrees(edges: DataFrame, srcCol: String,
                                        dstCol: String): (DataFrame, DataFrame) = {
    // the long cast below NULLs a non-numeric id and the u =!= v filter
    // then silently DROPS the edge — a string-keyed graph would return
    // zero triangles with no error, while the sibling graph ops (kCore,
    // labelPropagation, hits) accept any id type. Fail loudly instead;
    // string-keyed callers map ids through a lookup first.
    for (c <- Seq(srcCol, dstCol))
      require(graft.ops.Dedup.isIntegralIdType(edges.schema(c).dataType),
        s"triangle-family node ids must be integral (got " +
          s"$c: ${edges.schema(c).dataType.simpleString}; map string ids through a lookup)")
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val deg = e0.select(explode(array(col("u"), col("v"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    (e0, deg)
  }

  /** One row per triangle as its degree-ordered ascending labeling
    * (a, b, c) — the enumeration shared by [[triangleStats]] (global
    * count) and [[localClustering]] (per-node counts).
    */
  private def orientedTriangleRows(e0: DataFrame, deg: DataFrame): DataFrame = {
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val er = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(when(uFirst, col("u")).otherwise(col("v")).as("a"),
        when(uFirst, col("v")).otherwise(col("u")).as("b"))
    er.as("x")
      .join(er.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
      .join(er.select(col("a"), col("b").as("c")).as("z"), Seq("a", "c"))
  }

  /** Per-node triangle counts + LOCAL clustering coefficient
    * `2·T(x) / (d(x)·(d(x)−1))` — the node-level "how clique-like is my
    * neighborhood" signal ([[triangleStats]] gives the global
    * transitivity). Same degree-ordered enumeration (each triangle
    * appears once, then credits its three corners via one explode), so
    * the scale argument is identical — Σ outdeg² ≈ E^1.5, no global
    * sort anywhere. Degree-0/1 nodes have no wedge and report 0.0.
    * Output: (node, degree, n_triangles, lcc).
    */
  def localClustering(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val (e0, deg) = canonicalEdgesWithDegrees(edges, srcCol, dstCol)
    val perNode = orientedTriangleRows(e0, deg)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, col("x") === col("node"), "left")
      .select(col("x").as("node"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          (col("n_triangles") * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Dyadic EWMA — exponential smoothing with α = 1/2 and a `terms`-term
    * truncated tail, the anomaly-smoothing primitive with EXACT
    * arithmetic: because the decay is a power of two and the input is
    * integral, the weighted numerator Σₖ v₍ᵢ₋ₖ₎·2^(terms−1−k) is a pure
    * BIGINT expression — no decimal-precision cliffs, no float summation
    * order, engine-identical to the last bit; the one double division at
    * the end (by 2^terms·scaleDiv) is a single deterministic IEEE op.
    * Truncation error is bounded by 2^−terms·max|v| (the dropped tail's
    * total weight). One window shuffle on the key; the lag chain is
    * `terms` references into the SAME window frame — one sort, no
    * self-joins. Missing leading lags contribute 0 (standard warm-up).
    *
    * `valueInt` must be integral (pre-scale doubles with floor(v·1000)
    * and pass scaleDiv = 1000). Overflow bound: |v|·2^terms·terms < 2⁶³.
    */
  def dyadicEwma(df: DataFrame, key: Column, order: Seq[Column],
                 valueInt: Column, terms: Int = 16, scaleDiv: Double = 1.0): DataFrame = {
    require(terms >= 1 && terms <= 32)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val num = (0 until terms).map { k =>
      coalesce(lag(valueInt, k).over(w), lit(0L)) * lit(1L << (terms - 1 - k))
    }.reduce(_ + _)
    df.withColumn("ewma_num", num)
      .withColumn("ewma",
        col("ewma_num").cast("double") / lit((1L << terms).toDouble * scaleDiv))
  }

  /** Multi-source BFS hop distance: the minimum number of edges from any
    * seed to each reachable node, level-synchronous (one frontier⋈edges
    * round per hop — the Pregel iteration shape, same scale argument as
    * `Dedup.dedupClusters`' pointer-jumping branch). Rounds are bounded
    * by min(diameter, maxHops); each round is ONE equi-join on the edge
    * key plus ONE min-dist aggregation over candidates ∪ settled (a
    * settled node's smaller dist wins the min and the dist = hop filter
    * drops it; a new node's min IS hop) — the aggregation replaces the
    * previous candidate-distinct + settled anti-join, one hash shuffle
    * where two-plus ran. Never all-pairs; the shuffle volume per round is
    * |frontier adjacency| + |settled|, not |graph|.
    *
    * `edges` is directed (src, dst) — callers wanting undirected reach
    * union the reverse. Every round `localCheckpoint`s: the settled set
    * and frontier are re-read each iteration, and without truncation the
    * lineage (and the replayed join DAG) would double per hop. The
    * checkpoints are LAZY, materialized by the per-round `count()` that
    * also serves as the convergence probe — ONE job per hop (the
    * [[graft.ops.Dedup.dedupClusters]] pattern), where the eager-
    * checkpoint + `isEmpty` form paid two; on a loaded host scheduling
    * latency per job dominates the per-round work. A caller-materialized
    * edge frame (flat LogicalRDD with columns (src, dst)) is used as-is —
    * no second blocks copy — and only a checkpoint THIS call created is
    * freed when the loop exits; the result plan reads only the
    * already-materialized frontiers, never the edges.
    *
    * Returns (node, dist) for reached nodes only; dist 0 = the seeds.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // skip re-checkpointing an edge frame the CALLER already materialized
    // (a second checkpoint copies every block — at edge-corpus scale a
    // full extra pass); symmetrically, only free blocks this call created
    val proj = edges.select(col("src"), col("dst"))
    val eOwned = !org.apache.spark.sql.GraftBridge.isFlatRdd(edges) ||
      !(edges.columns sameElements Array("src", "dst"))
    val e = if (eOwned) proj.localCheckpoint(eager = false) else edges
    val seed0 = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint(eager = false)
    // per-hop frontiers are DISJOINT by construction (each is min-dist
    // filtered against everything before it), so the settled set is kept
    // as the lazy union of the checkpointed frontiers — re-materializing
    // the whole union every round would write O(rounds · |reached|)
    // instead of O(|reached|) total, and the union-of-checkpoints plan
    // stays flat (one leaf per hop, rounds ≤ maxHops)
    var parts = List(seed0)
    var frontier = seed0
    // materializes the lazy seed checkpoint AND tests emptiness in 1 job
    var frontierRows = seed0.count()
    var hop = 0
    while (hop < maxHops && frontierRows > 0L) {
      hop += 1
      val settled = parts.reduce(_.unionByName(_))
      // the candidate distinct + settled anti-join FUSE into one min-dist
      // aggregation: a settled node's dist < hop wins the min and the
      // filter drops it; a new node's min IS hop. One hash-agg shuffle
      // over |candidates| + |settled| where the anti-join form paid a
      // distinct shuffle AND a sort-merge of both sides.
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), lit(hop).as("dist"))
        .unionByName(settled)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .where(col("dist") === lit(hop))
        .localCheckpoint(eager = false)
      // one job: checkpoint-materialize the frontier (and, on hop 1, the
      // edge set it reads) + the convergence count
      frontierRows = next.count()
      parts = parts :+ next
      frontier = next
    }
    if (eOwned) org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
    parts.reduce(_.unionByName(_))
  }

  /** First-order Markov transition stats over an ordered per-key event
    * sequence: counts of (state → next state) plus the exact conditional
    * probability (one IEEE division of integer counts). One window
    * shuffle on the key (lead), one bounded aggregation (|states|² output
    * cells). The end of each key's sequence contributes no pair.
    */
  def markovTransitions(df: DataFrame, key: Column, order: Seq[Column],
                        state: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(order: _*)
    df.select(state.as("from_state"), lead(state, 1).over(w).as("to_state"))
      .where(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_state"))))
      .select(col("from_state"), col("to_state"), col("n"),
        col("row_total").cast("long").as("row_total"),
        (col("n").cast("double") / col("row_total").cast("double")).as("p"))
  }

  /** Ties-together quartile of a QUANTIZED value: quartile =
    * ⌊4·below/n⌋+1 (clamped to 4) assigned per distinct value, where
    * `below` counts rows with strictly smaller value. Equal values always
    * share a quartile — deterministic with no row-level tiebreak — and
    * the corpus-wide work is one groupBy plus a broadcast join of the
    * bounded distinct-value table back onto the rows (the aucExact scale
    * contract: the unpartitioned cumsum window runs over |value domain|
    * rows, so quantize first — NEVER a global ntile, which would move the
    * corpus to one partition). Returns (value → quartile) to join back.
    */
  def tiedQuartileMap(df: DataFrame, value: Column): DataFrame = {
    val per = df.select(value.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("_cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    per
      .withColumn("_below", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over())
      .select(col("v"),
        // integer `div`, not double `/`+cast: at 2⁵³-scale counts the
        // double quotient can round UP across a bucket boundary
        least(lit(4L), expr("(4 * _below) div _n") + 1L).as("quartile"))
  }

  /** Pearson χ² decomposition over a contingency table: per cell the
    * expected count and the χ² contribution (O·n − r·c)²/(n·r·c), plus
    * the statistic and degrees of freedom as constant columns.
    *
    * Determinism: every long product stays exact (contract: n < 3·10⁹
    * rows, the [[MlEval.aucExact]] bound — shard above that), the
    * long→double conversions are exact (< 2⁵³), and each cell is then
    * ONE square and ONE division — bit-identical in any IEEE engine. The
    * statistic is folded on the driver over the BOUNDED cell table in
    * (a, b) order (the [[Sampling]] order-pinned-fold convention;
    * float addition is not associative, so an unordered SQL SUM would be
    * engine-varying), mirrored externally by an ordered list_sum.
    */
  def chiSquare(df: DataFrame, a: Column, b: Column,
                maxCells: Int = 4096): DataFrame = {
    val cells = contingency(df, a, b)
      .select(col("a"), col("b"), col("n_obs"),
        col("row_total").cast("long").as("r"),
        col("col_total").cast("long").as("c"),
        col("n_total").cast("long").as("n"))
      .withColumn("expected",
        (col("r") * col("c")).cast("double") / col("n").cast("double"))
      .withColumn("contrib", {
        val num = (col("n_obs") * col("n") - col("r") * col("c")).cast("double")
        num * num / (col("n") * col("r") * col("c")).cast("double")
      })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = cells.select(col("a").cast("string"), col("b").cast("string"),
        col("contrib"))
      .coalesce(1).limit(maxCells + 1).collect()
    require(head.length <= maxCells,
      s"chiSquare: more than $maxCells cells — not a categorical×categorical input")
    // UTF-8-byte cell order (Arrays.compareUnsigned), matching external
    // binary collation for supplementary-plane labels — the
    // mixByTemperature lesson. NULL categories are legitimate cells
    // (contingency keeps null groupBy keys) and sort first, mirroring
    // ORDER BY ... NULLS FIRST — without the guard the fold NPEs on the
    // first null label
    val byUtf8: Ordering[String] = (x: String, y: String) =>
      if (x == null && y == null) 0
      else if (x == null) -1
      else if (y == null) 1
      else java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    implicit val pairOrd: Ordering[(String, String)] = Ordering.Tuple2(byUtf8, byUtf8)
    val chi2 = head.map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    // Degrees of freedom count NON-NULL levels only — the count(DISTINCT)
    // convention the DuckDB mirror uses (NULL cells still contribute to
    // chi2 above; they just don't add a level to (r−1)(c−1), matching
    // every SQL engine's DISTINCT semantics).
    // clamp each factor at 0: an ALL-NULL variable has zero non-null
    // levels and (0 − 1) would turn deg_free NEGATIVE instead of 0
    val dfDeg = math.max(0L,
        head.map(_.getString(0)).filter(_ != null).distinct.length - 1L) *
      math.max(0L, head.map(_.getString(1)).filter(_ != null).distinct.length - 1L)
    cells.select(col("a"), col("b"), col("n_obs"), col("expected"),
      col("contrib"), lit(chi2).as("chi2"), lit(dfDeg).as("deg_free"))
  }

  /** Schema/profile drift between two snapshots of "the same" table:
    * per column the row count, null count, and distinct count in each
    * side plus presence flags — the checks a pipeline runs before
    * accepting a new vendor drop. Columns are profiled via one
    * unpivoted pass per side (values stringified — drift detection
    * compares shapes, not types), full-outer-joined on column name:
    * added/removed columns surface as one-sided rows. Output bounded by
    * |columns|; each side is one linear pass + one agg.
    */
  def profileDrift(v1: DataFrame, v2: DataFrame): DataFrame = {
    def prof(df: DataFrame, side: String): DataFrame = {
      val cols = df.columns.toSeq
      val long = Transforms.unpivot(
        df.select(cols.map(c => col(c).cast("string").as(c)): _*),
        ids = Seq.empty, measures = cols, nameCol = "column_name", valueCol = "_v")
      long.groupBy(col("column_name"))
        .agg(count(lit(1)).as(s"n_rows_$side"),
          sum(when(col("_v").isNull, 1L).otherwise(0L)).as(s"n_nulls_$side"),
          // approx would break the oracle; distinct per column is
          // bounded by the profiled snapshot's row count
          countDistinct(col("_v")).as(s"n_distinct_$side"))
    }
    prof(v1, "v1").withColumnRenamed("column_name", "_c1")
      .join(prof(v2, "v2").withColumnRenamed("column_name", "_c2"),
        col("_c1") === col("_c2"), "full_outer")
      .select(coalesce(col("_c1"), col("_c2")).as("column_name"),
        col("_c1").isNotNull.as("in_v1"), col("_c2").isNotNull.as("in_v2"),
        coalesce(col("n_rows_v1"), lit(0L)).as("n_rows_v1"),
        coalesce(col("n_nulls_v1"), lit(0L)).as("n_nulls_v1"),
        coalesce(col("n_distinct_v1"), lit(0L)).as("n_distinct_v1"),
        coalesce(col("n_rows_v2"), lit(0L)).as("n_rows_v2"),
        coalesce(col("n_nulls_v2"), lit(0L)).as("n_nulls_v2"),
        coalesce(col("n_distinct_v2"), lit(0L)).as("n_distinct_v2"))
  }

  /** Exact 2-feature categorical Naive Bayes (Laplace α=1), binary
    * class: the third trainable model next to the perceptron and the
    * decision stump. The fit is two bounded count aggregations (per
    * (feature value, class) — the categorical-NB contract: feature
    * domains are bounded); the posterior comparison
    *   n₁·(c₁₁+1)(c₂₁+1)(n₀+V₁)(n₀+V₂)  vs  n₀·(c₁₀+1)(c₂₀+1)(n₁+V₁)(n₁+V₂)
    * is evaluated per (v₁, v₂) CELL on the driver in BigInteger — exact
    * at any corpus size, no float, no overflow — and folded into a
    * literal (f₁, f₂) → prediction CASE chain, so the distributed
    * predict is a pure codegen projection (the perceptronPredict
    * convention). Ties predict class 0 (pinned).
    */
  def naiveBayes2Fit(df: DataFrame, f1: Column, f2: Column, label: Column,
                     maxCells: Int = 4096): Column = {
    import java.math.BigInteger
    val proj = df.select(f1.cast("long").as("_f1"), f2.cast("long").as("_f2"),
      label.cast("int").as("_y"))
    // BOUNDED collects (the chiSquare discipline): a continuous feature
    // smuggled in as "categorical" must fail the maxCells require, not
    // OOM the driver first — cap each pull at the cell budget + 1 so the
    // overflow is detected from a bounded prefix
    def boundedCells(c: Column): Map[(Long, Int), Long] = {
      // coalesce(1) before limit (the chiSquare form): CollectLimit over a
      // multi-partition child probes partitions in EXTRA jobs; one
      // partition of a bounded table is one job
      val rows = proj.groupBy(c.as("_v"), col("_y")).agg(count(lit(1)).as("_c"))
        .coalesce(1).limit(2 * maxCells + 1).collect()
      require(rows.length <= 2 * maxCells,
        s"naiveBayes2Fit: a feature exceeds $maxCells distinct values — not categorical input")
      rows.map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    }
    val rows1 = boundedCells(col("_f1"))
    val rows2 = boundedCells(col("_f2"))
    val v1s = rows1.keys.map(_._1).toSeq.distinct.sorted
    val v2s = rows2.keys.map(_._1).toSeq.distinct.sorted
    require(v1s.size.toLong * v2s.size <= maxCells,
      s"naiveBayes2Fit: ${v1s.size}×${v2s.size} cells exceed $maxCells — not categorical input")
    val n0 = BigInteger.valueOf(rows1.collect { case ((_, 0), c) => c }.sum)
    val n1 = BigInteger.valueOf(rows1.collect { case ((_, 1), c) => c }.sum)
    val d01 = n0.add(BigInteger.valueOf(v1s.size))
    val d02 = n0.add(BigInteger.valueOf(v2s.size))
    val d11 = n1.add(BigInteger.valueOf(v1s.size))
    val d12 = n1.add(BigInteger.valueOf(v2s.size))
    def cnt(m: Map[(Long, Int), Long], v: Long, y: Int): BigInteger =
      BigInteger.valueOf(m.getOrElse((v, y), 0L) + 1L) // +1 = Laplace
    // bounded (v1, v2) → prediction table, exact integer comparison
    val nullP = lit(null).cast("int")
    val pred = v1s.foldLeft(nullP) { (acc1, a) =>
      val inner = v2s.foldLeft(nullP) { (acc2, b) =>
        val s1 = n1.multiply(cnt(rows1, a, 1)).multiply(cnt(rows2, b, 1))
          .multiply(d01).multiply(d02)
        val s0 = n0.multiply(cnt(rows1, a, 0)).multiply(cnt(rows2, b, 0))
          .multiply(d11).multiply(d12)
        val p = if (s1.compareTo(s0) > 0) 1 else 0
        when(col("_nbF2") === b, lit(p)).otherwise(acc2)
      }
      when(col("_nbF1") === a, inner).otherwise(acc1)
    }
    // callers select with the raw feature columns aliased to the probe names
    pred
  }

  /** Convenience: fit on `df` and return it with an exact NB prediction
    * column appended (unseen feature values predict null — surface them
    * rather than silently guessing).
    */
  def naiveBayes2Classify(df: DataFrame, f1: Column, f2: Column,
                          label: Column): DataFrame = {
    val predExpr = naiveBayes2Fit(df, f1, f2, label)
    df.withColumn("_nbF1", f1.cast("long"))
      .withColumn("_nbF2", f2.cast("long"))
      .withColumn("nb_pred", predExpr)
      .drop("_nbF1", "_nbF2")
  }

  /** Seasonal-baseline anomaly census with EXACT outlier flags and NO
    * float anywhere in the decision: measures pre-scale to integers
    * (caller passes an integral column, e.g. floor(v·10⁶) — the op_ewma
    * convention), each season's mean/variance stay rational, and the
    * z-style flag |v − μ| > k·σ cross-multiplies to pure integers:
    *   (n·v − s)² > k² · (n·ss − s²)
    * (both sides exact in DECIMAL(38,0); μ = s/n, σ² = ss/n − (s/n)²
    * multiplied through by n²). Two passes over the fact table (moments,
    * then flags — the standardizeStats literal-fold shape would fuse
    * them; here the season count is bounded so a broadcast join back is
    * one cheap exchange), output bounded by |seasons|.
    */
  def seasonalAnomaly(df: DataFrame, season: Column, valueInt: Column,
                      k: Int = 2): DataFrame = {
    val proj = df.select(season.as("season"), valueInt.cast("long").as("_v"))
    val moments = proj.groupBy(col("season"))
      .agg(count(col("_v")).as("_n"),
        sum(col("_v").cast("decimal(28,0)")).as("_s"),
        sum((col("_v") * col("_v")).cast("decimal(38,0)")).as("_ss"))
    val m = moments.select(col("season").as("_ms"), col("_n"), col("_s"), col("_ss"))
    // every product casts to decimal BEFORE multiplying — a long n·v
    // would wrap silently near the contract edge. CONTRACT: n·|v|max
    // < 10¹⁸ per season (e.g. 10⁹ rows of millionth-scaled values up
    // to 10³) so (n·v − s)² stays inside DECIMAL(38,0) — the
    // perceptron-style overflow window; shard seasons above it
    def d38(c: Column) = c.cast("decimal(38,0)")
    val lhs = {
      val t = d38(col("_n")) * d38(col("_v")) - d38(col("_s"))
      t * t
    }
    val rhs = lit(k.toLong * k) *
      (d38(col("_n")) * d38(col("_ss")) - d38(col("_s")) * d38(col("_s")))
    // NULL-SAFE join-back: groupBy created a NULL-season moments row, so
    // plain === would silently drop every NULL-season input row here (the
    // kSuppress hazard this file documents)
    proj.join(broadcast(m), col("season") <=> col("_ms"))
      .groupBy(col("season"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("_s").cast("double") / col("_n").cast("double")).as("season_mean"),
        sum(when(lhs > rhs, 1L).otherwise(0L)).as("n_anomalies"))
  }

  /** ClickHouse-style windowFunnel, exact for a 3-stage chain: per
    * entity, the deepest stage s1→s2→s3 reachable with every step inside
    * `windowUs` of the CHAIN'S FIRST event. Pure window algebra on the
    * entity timeline — no self-joins:
    *  - vbest(c) = latest s1 strictly before the s2 event c, nulled when
    *    older than c − T (the only s1 that can anchor a chain through c
    *    is the latest one);
    *  - a running max of the surviving anchors over s2 events tells each
    *    s3 event p whether SOME chain anchor v satisfies p ≤ v + T.
    * Returns one row per entity: (entity, depth ∈ 0..3). One window
    * shuffle on the entity key; constant per-row state.
    */
  def windowFunnel3(df: DataFrame, entity: Column, tsUs: Column,
                    tiebreak: Column, eventType: Column,
                    s1: String, s2: String, s3: String,
                    windowUs: Long): DataFrame = {
    val base = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_e")).orderBy(col("_ts"), col("_rk"))
    val prior = base.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val upTo = base.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // tiebreak must be a STABLE row id (event id) — monotonically_
    // increasing_id would order ts-ties by partition layout
    val proj = df.select(entity.as("_e"), tsUs.cast("long").as("_ts"),
      eventType.as("_et"), tiebreak.as("_rk"))
    val vbest = last(when(col("_et") === s1, col("_ts")), ignoreNulls = true)
      .over(prior)
    val annotated = proj
      .withColumn("_vok",
        when(col("_et") === s2,
          when(vbest >= col("_ts") - windowUs, vbest)))
      .withColumn("_anchor", max(col("_vok")).over(upTo))
    annotated.groupBy(col("_e").as("entity"))
      .agg(
        max(when(col("_et") === s1, 1L).otherwise(0L)).as("_d1"),
        max(when(col("_vok").isNotNull, 1L).otherwise(0L)).as("_d2"),
        max(when(col("_et") === s3 && col("_anchor") >= col("_ts") - windowUs,
          1L).otherwise(0L)).as("_d3"))
      .select(col("entity"),
        (col("_d1") + col("_d1") * col("_d2") + col("_d1") * col("_d2") * col("_d3"))
          .as("depth"))
  }

  /** Exact 1-rule learner (decision stump): over integer features,
    * choose the (feature, threshold, polarity) minimizing
    * misclassifications of the ±-free {0,1} label, with a fully
    * deterministic tie-break (err, feature name, threshold, polarity).
    * Per feature: ONE groupBy on the feature value + a cumulative window
    * over the bounded distinct-value table (the [[MlEval.aucExact]]
    * quantized-feature contract) computes every threshold's error from
    * (pos_below, neg_below) in integers; the global argmin is a bounded
    * TakeOrdered over the unioned error tables. Output: one row
    * (feature, threshold, polarity, err, n_rows).
    * Polarity 'ge' predicts 1 when v ≥ threshold; 'lt' the complement.
    */
  def decisionStumpFit(df: DataFrame, features: Seq[(String, Column)],
                       label: Column): DataFrame = {
    require(features.nonEmpty)
    val errTables = features.map { case (name, f) =>
      val per = df.select(f.cast("long").as("v"), label.cast("long").as("y"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("_cnt"), sum(col("y")).as("_pos"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val tot = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      per
        .withColumn("_posBelow", coalesce(sum(col("_pos")).over(w), lit(0L)))
        .withColumn("_cntBelow", coalesce(sum(col("_cnt")).over(w), lit(0L)))
        .withColumn("_posTot", sum(col("_pos")).over(tot))
        .withColumn("_n", sum(col("_cnt")).over(tot))
        .select(lit(name).as("feature"), col("v").as("threshold"),
          // predict 1 on v ≥ t: errors = positives below t + negatives at/above t
          (col("_posBelow") +
            ((col("_n") - col("_cntBelow")) - (col("_posTot") - col("_posBelow"))))
            .as("_errGe"),
          col("_n"))
        .select(col("feature"), col("threshold"), col("_n"),
          explode(array(
            struct(lit("ge").as("polarity"), col("_errGe").as("err")),
            struct(lit("lt").as("polarity"), (col("_n") - col("_errGe")).as("err"))))
            .as("_pe"))
        .select(col("feature"), col("threshold"),
          col("_pe.polarity").as("polarity"), col("_pe.err").as("err"),
          col("_n").as("n_rows"))
    }
    errTables.reduce(_.unionByName(_))
      .orderBy(col("err"), col("feature"), col("threshold"), col("polarity"))
      .limit(1)
  }

  /** k-core decomposition (fixed k): iteratively peel nodes of degree
    * < k until stable; returns the surviving nodes with their degree
    * WITHIN the core subgraph. Edges canonicalize first (undirected,
    * self-loops dropped, duplicates/reverses collapse).
    *
    * Scale: each round is one degree aggregation + two sort-merge semi
    * joins (the survivor set grows toward node count — never broadcast);
    * rounds are bounded by the peeling depth (≤ maxRounds guard; a path
    * graph peels from both ends, so depth can reach n/2 — that is the
    * exact algorithm's frontier, not an implementation artifact).
    * Per-round edge tables localCheckpoint so the plan stays flat (the
    * [[bfsHops]] convention); the fixpoint test is the edge COUNT — a
    * metadata-sized driver scalar per round.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 64): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    // lazy checkpoint + count: ONE job per peel round materializes the
    // round AND reads the convergence census (the bfsHops discipline —
    // the eager-checkpoint + count form paid two). Superseded rounds'
    // blocks are freed as the loop advances; the final round's blocks
    // back the returned frame.
    var cur = canon.localCheckpoint(eager = false)
    var nEdges = cur.count()
    var rounds = 0
    var stable = nEdges == 0L
    while (!stable && rounds < maxRounds) {
      rounds += 1
      val deg = cur.select(col("a").as("node"))
        .unionAll(cur.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select(col("node"))
      val next = cur
        .join(keep.hint("merge"), cur("a") === keep("node"), "left_semi")
        .join(keep.hint("merge"), cur("b") === keep("node"), "left_semi")
        .localCheckpoint(eager = false)
      val m = next.count()
      org.apache.spark.sql.GraftBridge.freeCheckpoint(cur)
      cur = next; stable = m == nEdges; nEdges = m
    }
    // an unconverged peel is a WRONG subgraph (nodes below degree k still
    // present), not a looser approximation — fail loudly like
    // dedupClusters does, never degrade silently. Practically unreachable:
    // each round removes ≥ 1 node or stabilizes, so 64 rounds cover every
    // graph whose peeling depth is < 64 — raise maxRounds for deeper ones.
    if (!stable)
      throw new IllegalStateException(
        s"kCore: not converged after $maxRounds rounds ($nEdges edges still peeling) — " +
          "raise maxRounds")
    cur.select(col("a").as("node"))
      .unionAll(cur.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** k-suppression — the APPLIED half of [[kAnonymityAudit]]: rows whose
    * quasi-identifier group has fewer than k members are suppressed
    * (flagged; callers null the QI columns on the flag) so every
    * surviving group is ≥ k by construction. Implemented as the group
    * census joined back on the QI tuple (sort-merge — the group table is
    * corpus-sized in the worst case), ONE extra shuffle over the audit.
    * The join-back is NULL-SAFE (`<=>`): groupBy treats a NULL QI value
    * as a real group key, so the enforcement must too — a null-unsafe
    * join would silently leave every row of a sub-k NULL-QI group
    * unsuppressed, disagreeing with [[kAnonymityAudit]] on exactly the
    * privacy-sensitive rows. Returns the input plus `_suppress`.
    */
  def kSuppress(df: DataFrame, qiCols: Seq[Column], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 2)
    val names = qiCols.indices.map(i => s"_qi$i")
    val sNames = qiCols.indices.map(i => s"_sqi$i")
    val tagged = df.select(col("*") +: qiCols.zip(names).map { case (c, n) => c.as(n) }: _*)
    val small = tagged.groupBy(names.map(col): _*).agg(count(lit(1)).as("_sz"))
      .where(col("_sz") < k)
      .select(names.zip(sNames).map { case (n, sn) => col(n).as(sn) } :+
        lit(true).as("_suppress"): _*)
    val cond = names.zip(sNames).map { case (n, sn) => col(n) <=> col(sn) }
      .reduce(_ && _)
    tagged.join(small.hint("merge"), cond, "left")
      .withColumn("_suppress", coalesce(col("_suppress"), lit(false)))
      .drop(names ++ sNames: _*)
  }

  /** Degree assortativity — Newman's r: the Pearson correlation of
    * endpoint degrees over the undirected edge list (positive = hubs
    * attach to hubs, negative = hub-and-spoke). Each canonical edge
    * contributes BOTH orientations (the standard symmetrized estimator),
    * so the moments are symmetric and only (Σx, Σx², Σxy, m) are needed
    * — exact DECIMAL sums over the degree-lookup join, one corr double
    * tree at the end (the op_regression discipline). Degenerate graphs
    * (regular: zero degree variance) yield NULL r. Two bounded shuffles:
    * the degree census + the two degree-lookup joins of
    * [[canonicalEdgesWithDegrees]]'s tables. Output (one row):
    * n_edges, r.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    val (e0, deg) = canonicalEdgesWithDegrees(edges, srcCol, dstCol)
    val joined = e0
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    val m = joined.agg(count(lit(1)).as("n_edges"),
      sum(d(col("du")) + col("dv")).as("sx"),
      sum(d(col("du")) * col("du") + d(col("dv")) * col("dv")).as("sxx"),
      sum(d(col("du")) * col("dv") * 2).as("sxy"))
    m.select(col("n_edges"),
      {
        val n = (col("n_edges") * 2).cast("double")
        val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
        val sxy = col("sxy").cast("double")
        val vx = n * sxx - sx * sx
        when(vx > 0.0, (n * sxy - sx * sx) / vx).as("r")
      })
  }

  /** Row-pattern statistics per key — the MATCH_RECOGNIZE-lite census:
    * local peaks/valleys (strictly greater/smaller than BOTH neighbors —
    * ties break no pattern) and the longest strictly-monotone up/down
    * runs via the gaps-and-islands trick (run id = running count of
    * direction changes; islands grouped and measured). All integer-exact.
    * One shuffle on the key (the three window passes share the partition
    * sort), plus one bounded (key, island) aggregation. Endpoints have
    * one neighbor and can't be peaks; a run of length n covers n+1 rows
    * but is measured in STEPS (n) — the convention the oracle mirrors.
    * Output: (key, n_rows, n_peaks, n_valleys, longest_up, longest_down).
    */
  def peakRunStats(df: DataFrame, key: Column, order: Seq[Column],
                   valueInt: Column): DataFrame = {
    // project FIRST, window over the projected names: the caller's key/
    // order expressions may not survive the projection
    val proj = df.select((key.as("grp") +: valueInt.as("_v") +:
      order.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }): _*)
    val ord = order.indices.map(i => col(s"_o$i"))
    val w = Window.partitionBy(col("grp")).orderBy(ord: _*)
    val marked = proj
      .withColumn("_prev", lag(col("_v"), 1).over(w))
      .withColumn("_next", lead(col("_v"), 1).over(w))
      .withColumn("_dir",
        when(col("_prev").isNull, lit(0))
          .when(col("_v") > col("_prev"), lit(1))
          .when(col("_v") < col("_prev"), lit(-1)).otherwise(lit(0)))
      .withColumn("_chg",
        when(lag(col("_dir"), 1).over(w).isNull ||
          col("_dir") =!= lag(col("_dir"), 1).over(w), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(
        Window.partitionBy(col("grp")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val runs = marked.where(col("_dir") =!= 0)
      .groupBy(col("grp"), col("_run"), col("_dir"))
      .agg(count(lit(1)).as("_len"))
    val runAgg = runs.groupBy(col("grp"))
      .agg(max(when(col("_dir") === 1, col("_len"))).as("_lu"),
        max(when(col("_dir") === -1, col("_len"))).as("_ld"))
    val peakAgg = marked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_prev").isNotNull && col("_next").isNotNull &&
          col("_v") > col("_prev") && col("_v") > col("_next"), 1L)
          .otherwise(0L)).as("n_peaks"),
        sum(when(col("_prev").isNotNull && col("_next").isNotNull &&
          col("_v") < col("_prev") && col("_v") < col("_next"), 1L)
          .otherwise(0L)).as("n_valleys"))
    peakAgg.join(runAgg, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"), col("n_peaks"), col("n_valleys"),
        coalesce(col("_lu"), lit(0L)).as("longest_up"),
        coalesce(col("_ld"), lit(0L)).as("longest_down"))
  }

  /** Hierarchy flattening — every node's ROOT and DEPTH in a parent-
    * pointer forest (org charts, category trees, reply threads): the
    * engine's answer to `WITH RECURSIVE`, which Spark lacks. POINTER
    * DOUBLING, not per-level walking: each round joins the current
    * (node → known-ancestor, distance) table with itself, so the jump
    * distance doubles and a depth-D forest settles in ⌈log₂ D⌉ rounds —
    * per-level recursion would pay D shuffle rounds, fatal on deep
    * chains. Rounds use the lazy-localCheckpoint + count() convergence
    * probe (one job per round, the bfsHops/dedupClusters pattern); the
    * count of unsettled nodes is the driver-side scalar. Roots have
    * depth 0 and are their own root. Defective forests degrade loudly,
    * never silently: a node whose chain exceeds `maxRounds` doublings
    * (depth > 2^maxRounds — in practice a CYCLE, which a parent forest
    * must not contain) and a node whose chain hits a DANGLING parent id
    * (a pointer to a node with no row — the deleted-manager defect) are
    * both returned with their partial ancestor and `settled = false`;
    * no input node is ever dropped from the output.
    * Output: (node, root, depth, settled).
    */
  def hierarchyFlatten(nodes: DataFrame, nodeCol: String, parentCol: String,
                       maxRounds: Int = 20): DataFrame = {
    var cur = nodes.select(col(nodeCol).as("node"),
        coalesce(col(parentCol), col(nodeCol)).as("anc"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("depth"),
        col(parentCol).isNull.as("settled"),
        lit(false).as("_dang"))
      .localCheckpoint(eager = false)
    var active = cur.where(!col("settled") && !col("_dang")).count()
    var round = 0
    while (active > 0 && round < maxRounds) {
      round += 1
      val b = cur.select(col("node").as("_bn"), col("anc").as("_banc"),
        col("depth").as("_bd"), col("settled").as("_bs"))
      // LEFT join: a missing ancestor row is a dangling parent pointer —
      // the node keeps its partial state and stops jumping (terminal,
      // settled = false), instead of vanishing from an inner join
      val frozen = col("settled") || col("_dang") || col("_bn").isNull
      val next = cur.join(b.hint("merge"), col("anc") === col("_bn"), "left")
        .select(col("node"),
          when(frozen, col("anc")).otherwise(col("_banc")).as("anc"),
          when(frozen, col("depth")).otherwise(col("depth") + col("_bd")).as("depth"),
          (col("settled") || (col("_bn").isNotNull && col("_bs"))).as("settled"),
          (col("_dang") || (!col("settled") && col("_bn").isNull)).as("_dang"))
        .localCheckpoint(eager = false)
      active = next.where(!col("settled") && !col("_dang")).count()
      // superseded doubling rounds' blocks free as the loop advances (the
      // kCore discipline); the final round's blocks back the returned frame
      org.apache.spark.sql.GraftBridge.freeCheckpoint(cur)
      cur = next
    }
    cur.select(col("node"), col("anc").as("root"), col("depth"), col("settled"))
  }

  /** Per-key UNION length of (possibly overlapping) intervals — the
    * covered-time primitive (billing, uptime, sensor coverage): the
    * classic sweep, expressed as ONE key-window pass. Each interval
    * contributes `max(0, end − max(start, max-prior-end))` — overlap with
    * anything earlier is clipped by the running maximum of previous ends,
    * so overlaps never double-count and intervals CONTAINED in an earlier
    * one contribute 0. All arithmetic exact integers (µs); per-key series
    * must fit a task sort (the TWAP contract). Zero-/negative-length
    * intervals contribute 0. Output: (key, n_intervals, covered).
    */
  def intervalUnionLength(df: DataFrame, key: Column, order: Seq[Column],
                          startCol: Column, endCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.where(startCol.isNotNull && endCol.isNotNull)
      .select(key.as("grp"), startCol.as("_s"), endCol.as("_e"),
        max(endCol).over(w).as("_pmax"))
      .select(col("grp"),
        greatest(col("_e") - greatest(col("_s"), coalesce(col("_pmax"), col("_s"))),
          lit(0L)).as("_contrib"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_intervals"), sum(col("_contrib")).as("covered"))
  }

  /** Per-key lag-k autocorrelation (ACF) of an integer-quantized series —
    * the time-series memory diagnostic (seasonality/trend screening)
    * computed the hash-portable way: ONE window pass materializes the k
    * leads (shared frame sort), ONE aggregation computes, per lag, the
    * exact decimal Pearson moments over the defined pairs (rows whose
    * lead exists), and each ACF is the op_regression corr double tree —
    * identical operands, identical shape, identical bits in any engine.
    * Built-in `corr()` is accumulation-order dependent and would flake.
    * `valueInt` must be integral (pre-scale with floor(v·1000)); moments
    * are DECIMAL(38,0)-exact to ~10¹² rows at |v|≤10⁶. Degenerate lags
    * (no pairs, zero variance) yield NULL, never a division error.
    * Output: (key, n_pairs_1..maxLag, acf_1..maxLag).
    */
  def autocorrelation(df: DataFrame, key: Column, order: Seq[Column],
                      valueInt: Column, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val base = df.select((key.as("grp") +: valueInt.as("_v") +:
      (1 to maxLag).map(k => lead(valueInt, k).over(w).as(s"_l$k"))): _*)
    def d(c: Column) = c.cast("decimal(38,0)")
    val aggs = (1 to maxLag).flatMap { k =>
      val lk = col(s"_l$k"); val v = col("_v")
      // a pair exists only when BOTH ends are non-null — else n would
      // count rows whose moments the null-skipping sums exclude
      val in = lk.isNotNull && v.isNotNull
      Seq(
        sum(when(in, 1L).otherwise(0L)).as(s"n$k"),
        sum(when(in, d(v))).as(s"sx$k"),
        sum(when(in, d(lk))).as(s"sy$k"),
        sum(when(in, d(v) * v)).as(s"sxx$k"),
        sum(when(in, d(lk) * lk)).as(s"syy$k"),
        sum(when(in, d(v) * lk)).as(s"sxy$k"))
    }
    val m = base.groupBy(col("grp")).agg(aggs.head, aggs.tail: _*)
    val outCols = col("grp") +:
      ((1 to maxLag).map(k => col(s"n$k").as(s"n_pairs_$k")) ++
        (1 to maxLag).map { k =>
          def dd(n: String) = col(n).cast("double")
          val n = dd(s"n$k"); val sx = dd(s"sx$k"); val sy = dd(s"sy$k")
          val sxx = dd(s"sxx$k"); val syy = dd(s"syy$k"); val sxy = dd(s"sxy$k")
          val varx = n * sxx - sx * sx
          val vary = n * syy - sy * sy
          when(col(s"n$k") > 0 && varx > 0.0 && vary > 0.0,
            (n * sxy - sx * sy) / sqrt(varx * vary)).as(s"acf_$k")
        })
    m.select(outCols: _*)
  }

  /** 3×3 determinant as a FIXED expression tree — shared by [[ols2]] and
    * its oracle mirror so the float evaluation order can never drift
    * between engines (identical operands + identical shape = identical
    * bits; the op_regression discipline applied to Cramer's rule).
    */
  def det3(a: Seq[Seq[Column]]): Column =
    a(0)(0) * (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) -
      a(0)(1) * (a(1)(0) * a(2)(2) - a(1)(2) * a(2)(0)) +
      a(0)(2) * (a(1)(0) * a(2)(1) - a(1)(1) * a(2)(0))

  /** Closed-form multivariate OLS (two features + intercept) from EXACT
    * moments — `y ~ b0 + b1·x1 + b2·x2` solved by Cramer's rule on the
    * normal equations: ONE aggregation computes the 9 decimal moments
    * (order-independent partial sums; x1/x2 must be integer-valued, y
    * exact at `yScale` dp — the caller quantizes, e.g. `floor(v·100+½)`),
    * then each determinant is the fixed [[det3]] double expression tree
    * over exactly-converted moments and each coefficient ONE final
    * division. The built-in `regr_*`/matrix solvers are float-
    * accumulation order-dependent and engine-varying; this form is
    * hash-portable. Singular designs (det = 0: constant or collinear
    * features) yield NULL coefficients, never a division blowup.
    * Output (one row): n_rows, b0, b1, b2.
    */
  def ols2(df: DataFrame, x1: Column, x2: Column, y: Column,
           yScale: Int = 2): DataFrame = {
    // cast to DECIMAL BEFORE multiplying (the repo-wide overflow
    // discipline): x1*x1 in the INPUT type would silently wrap for
    // IntegerType features >= 46341 and LongType past 2^31.5, then cast
    // the wrapped value — exact-looking garbage. Decimal × input is
    // exact and widens.
    val x1d = x1.cast("decimal(18,0)")
    val x2d = x2.cast("decimal(18,0)")
    val m = df.agg(
      count(lit(1)).as("n_rows"),
      sum(x1d).cast("double").as("s1"),
      sum(x2d).cast("double").as("s2"),
      sum((x1d * x1).cast("decimal(38,0)")).cast("double").as("s11"),
      sum((x1d * x2).cast("decimal(38,0)")).cast("double").as("s12"),
      sum((x2d * x2).cast("decimal(38,0)")).cast("double").as("s22"),
      sum(y.cast(s"decimal(24,$yScale)")).cast("double").as("sy"),
      sum((x1d * y).cast(s"decimal(38,$yScale)")).cast("double").as("s1y"),
      sum((x2d * y).cast(s"decimal(38,$yScale)")).cast("double").as("s2y"))
    val n = col("n_rows").cast("double")
    val (s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (col("s1"), col("s2"), col("s11"), col("s12"), col("s22"),
        col("sy"), col("s1y"), col("s2y"))
    val dA = det3(Seq(Seq(n, s1, s2), Seq(s1, s11, s12), Seq(s2, s12, s22)))
    val d0 = det3(Seq(Seq(sy, s1, s2), Seq(s1y, s11, s12), Seq(s2y, s12, s22)))
    val d1 = det3(Seq(Seq(n, sy, s2), Seq(s1, s1y, s12), Seq(s2, s2y, s22)))
    val d2 = det3(Seq(Seq(n, s1, sy), Seq(s1, s11, s1y), Seq(s2, s12, s2y)))
    m.select(col("n_rows"),
      when(dA =!= 0.0, d0 / dA).as("b0"),
      when(dA =!= 0.0, d1 / dA).as("b1"),
      when(dA =!= 0.0, d2 / dA).as("b2"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) two-sample test over a QUANTIZED
    * value domain — the nonparametric A/B readout for non-normal metrics
    * (latencies, prices), exact where every engine's naive ranking
    * flakes: ranks come from the bounded per-value census (the aucExact
    * group-cumsum shape, ONE corpus shuffle), midrank ties are kept
    * integral by working in DOUBLED ranks (2·midrank = 2·below + t + 1),
    * and every moment (R₁, U₁, the tie-corrected variance numerator) is
    * an exact DECIMAL(38,0) integer — BIGINT products overflow at corpus
    * scale, and t³ terms stay in range to ~10¹² rows per value. Only the
    * final z is floating point: the fixed expression sequence
    * `((2U₁−n₁n₂)/2) / sqrt(V₁₂ / (12n(n−1)))` — each step a
    * deterministic IEEE op on exactly-converted values, so
    * engine-portable (the cosSql discipline). Degenerate inputs (empty
    * group, all values tied) yield NULL z, never a division error.
    *
    * CONVENTION: `u1_x2 / 2 = n₁n₂ + n₁(n₁+1)/2 − R₁` — twice the number
    * of (a, b) pairs with a BELOW b (ties ½), i.e. n₁n₂ − U_scipy under
    * scipy's R₁-based U₁. Consequently z is NEGATIVE when group A is
    * stochastically LARGER; |z| and two-sided decisions match any
    * implementation, but compare signed values only after aligning the
    * convention.
    * Output (one row): n1, n2, u1_x2 (doubled, exact), z.
    */
  def mannWhitney(df: DataFrame, value: Column, isGroupA: Column): DataFrame = {
    def d(c: Column) = c.cast("decimal(38,0)")
    // null values carry no rank information — and unfiltered they would
    // form a nulls-first cell that shifts every real `below` count
    val cells = df.where(value.isNotNull).groupBy(value.as("v"))
      .agg(sum(when(isGroupA, 1L).otherwise(0L)).as("ca"),
        count(lit(1)).as("ct"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("below", coalesce(sum(col("ct")).over(w), lit(0L)))
      .select(col("ca"), col("ct"),
        (d(col("ca")) * (col("below") * 2 + col("ct") + 1)).as("r1x2_term"),
        (d(col("ct")) * col("ct") * col("ct") - col("ct")).as("ties_term"))
    val m = ranked.agg(sum(col("ca")).as("n1"), sum(col("ct")).as("n"),
      sum(col("r1x2_term")).as("r1x2"), sum(col("ties_term")).as("ties"))
    m.select(col("n1"), (col("n") - col("n1")).as("n2"), col("n"),
        col("r1x2"), col("ties"))
      .select(col("n1"), col("n2"),
        (d(col("n1")) * col("n2") * 2 + d(col("n1")) * (col("n1") + 1) -
          col("r1x2")).as("_u1x2"),
        (d(col("n1")) * col("n2") *
          (d(col("n") + 1) * col("n") * (col("n") - 1) - col("ties"))).as("_v12"),
        col("n"))
      .select(col("n1"), col("n2"), col("_u1x2").cast("double").as("u1_x2"),
        // _v12 ≈ n⁵/4 overflows DECIMAL(38,0) (→ NULL under ANSI-off)
        // around n ≈ 5·10⁷ total rows — fail loudly there instead of
        // returning the same NULL z a degenerate all-tied input does
        // (shard the test above that scale)
        when(col("_v12").isNull && col("n") > 0,
          raise_error(lit("mannWhitney: variance product overflowed DECIMAL(38,0) " +
            "(n ≳ 5e7 rows) — shard the test, the NULL would read as 'degenerate input'")))
          .otherwise(
            when(col("_v12") > 0 && col("n1") > 0 && col("n2") > 0,
              ((col("_u1x2") - d(col("n1")) * col("n2")).cast("double") / lit(2.0)) /
                sqrt(col("_v12").cast("double") /
                  (d(lit(12)) * col("n") * (col("n") - 1)).cast("double"))))
          .as("z"))
  }

  /** Per-group Gini impurity of a label distribution — the log-free
    * diversity/purity signal (the entropy stand-in that stays EXACT:
    * 1 − Σp² is pure rational arithmetic, while Shannon entropy's ln
    * flakes on libm last-ulp differences across engines). Computed as
    * `(n² − Σ n_l²) / n²` with the integer squares in DECIMAL(38,0)
    * (mirrors DuckDB HUGEINT; n_l² overflows BIGINT near 3·10⁹ rows per
    * label) and ONE final float division of two exactly-converted
    * values. Two aggregations, both map-side combined; output bounded by
    * |groups|. Output: (group, n, gini).
    */
  def giniImpurity(df: DataFrame, group: Column, label: Column): DataFrame =
    df.groupBy(group.as("grp"), label.as("_lbl"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("grp"))
      .agg(sum(col("_c")).as("n"),
        sum(col("_c").cast("decimal(38,0)") * col("_c")).as("_ssq"))
      .select(col("grp"), col("n"),
        ((col("n").cast("decimal(38,0)") * col("n") - col("_ssq")).cast("double") /
          (col("n").cast("decimal(38,0)") * col("n")).cast("double")).as("gini"))

  /** Benford's-law first-digit audit — the classic fraud/data-quality
    * screen: distribution of the leading digit of a positive integer
    * measure vs the Benford expectation. The observed share is the exact
    * integer `10⁶·count div total`; the expectation `log10(1+1/d)` is a
    * PRECOMPUTED literal table in millionths (embedding the constants —
    * not computing logs at query time — keeps both engines bit-identical;
    * the docSurprisal/gini log-avoidance discipline). The leading digit
    * comes from the value's decimal string (exact for integers; no float
    * log10). One bounded aggregation (≤9 cells) + a broadcast scalar
    * total. Output: (digit, n, observed_millionths, expected_millionths,
    * deviation_millionths) for digits 1-9 present in the data.
    */
  val benfordExpectedMillionths: Map[Int, Long] = Map(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  def benfordAudit(df: DataFrame, valueInt: Column): DataFrame = {
    val digit = substring(valueInt.cast("string"), 1, 1).cast("int")
    val counts = df.where(valueInt > 0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    val expected = benfordExpectedMillionths.foldLeft(lit(null).cast("long")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("1000000 * n div _total").as("observed_millionths"),
        expected.as("expected_millionths"))
      .withColumn("deviation_millionths",
        abs(col("observed_millionths") - col("expected_millionths")))
  }

  /** Weighted median over a QUANTIZED value domain — the aucExact
    * group-cumsum shape applied to weighted quantiles: per (group,
    * value) exact DECIMAL weight sums (ONE corpus shuffle, map-side
    * combined, ≤|groups|·|domain| rows), then the running weight within
    * each group's bounded value list and the smallest value whose
    * doubled cumulative weight reaches the group total (the lower
    * weighted median — deterministic, no interpolation, exact decimal
    * comparisons). Output: (group, median, total_weight).
    */
  def weightedMedianQuantized(df: DataFrame, group: Column, value: Column,
                              weight: Column, scale: Int = 2): DataFrame = {
    // a NULL value cell would sort first and pollute every cumulative
    // weight; a NULL weight contributes no mass — both drop
    val wq = df.where(value.isNotNull && weight.isNotNull)
      .groupBy(group.as("grp"), value.as("v"))
      .agg(sum(weight.cast(s"decimal(38,$scale)")).as("w"))
    val wc = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wt = Window.partitionBy(col("grp"))
    wq.withColumn("_cum", sum(col("w")).over(wc))
      .withColumn("_tot", sum(col("w")).over(wt))
      .groupBy(col("grp"))
      .agg(min(when(col("_cum") * 2 >= col("_tot"), col("v"))).as("median"),
        max(col("_tot")).cast("double").as("total_weight"))
  }

  /** 2-D skyline (Pareto frontier): rows not dominated under (minimize
    * `cost`, maximize `value`) — row r is dominated iff some other row has
    * cost ≤ r.cost ∧ value ≥ r.value with at least one strict. Classic
    * OLAP operator (Börzsönyi et al., ICDE 2001); the naive form is the
    * quadratic NOT-EXISTS self-join, which dies at corpus scale.
    *
    * This implementation requires `cost` to have a BOUNDED DISTINCT
    * DOMAIN (quantized — sizes, grades, bucketed prices), which turns the
    * frontier into the aucExact group-cumsum shape: ONE corpus
    * aggregation to per-cost maxima (map-side combined, ≤|domain| rows),
    * an unpartitioned running-max window over that bounded table (lint-
    * compliant: sits above an aggregate), and a broadcast join of the
    * surviving frontier back onto the corpus. A row is on the skyline iff
    * its value equals its cost's maximum AND that maximum strictly
    * exceeds the best value over all strictly smaller costs (ties on the
    * frontier point all survive — neither dominates the other without a
    * strict inequality).
    *
    * Scale: one shuffle (the bounded agg) + one broadcast probe; never
    * all-pairs. Output: the input rows on the frontier.
    */
  def skyline2D(df: DataFrame, costCol: String, valueCol: String): DataFrame = {
    // null-cost rows can't be on (or dominate) the frontier, but without
    // this filter the NULL group would sort FIRST (asc nulls-first) and
    // its max value would pollute the running max for every real cost
    val perCost = df.where(col(costCol).isNotNull)
      .groupBy(col(costCol).as("_sk_cost"))
      .agg(max(col(valueCol)).as("_sk_vmax"))
    val w = Window.orderBy(col("_sk_cost"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perCost
      .withColumn("_sk_prev", max(col("_sk_vmax")).over(w))
      .where(col("_sk_prev").isNull || col("_sk_vmax") > col("_sk_prev"))
      .select(col("_sk_cost"), col("_sk_vmax"))
    df.join(broadcast(frontier),
        col(costCol) === col("_sk_cost") && col(valueCol) === col("_sk_vmax"))
      .drop("_sk_cost", "_sk_vmax")
  }

  /** Ordered k-gram pattern mining over per-key event sequences: counts
    * every length-`k` run of consecutive `state` values within each key's
    * `order`-sorted timeline (PrefixSpan's contiguous special case — the
    * form that needs no candidate generation). ONE window shuffle on the
    * key (the k−1 `lead`s share a single frame sort) and one bounded
    * aggregation: the output is ≤|states|^k cells regardless of corpus
    * size. Sequences shorter than k contribute nothing; counts are exact
    * integers. Output: pattern element columns `s0..s{k-1}` + `n`.
    */
  def sequencePatterns(df: DataFrame, key: Column, order: Seq[Column],
                       state: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 8, "pattern length must be in [2,8]")
    val w = Window.partitionBy(key).orderBy(order: _*)
    val cols = (0 until k).map(i =>
      (if (i == 0) state else lead(state, i).over(w)).as(s"s$i"))
    df.select(cols: _*)
      .where((1 until k).map(i => col(s"s$i").isNotNull).reduce(_ && _))
      .groupBy((0 until k).map(i => col(s"s$i")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Synchronous label-propagation community detection (LPA), made
    * DETERMINISTIC: labels start as node ids; each round every node
    * adopts the most frequent label among its neighbors with ties broken
    * by the SMALLEST label (one max(struct(cnt, −label)) per node — no
    * randomized visit order, so the result is replayable in unrolled SQL
    * and invariant to partitioning). Edges are treated as undirected;
    * parallel edges weight the vote (multigraph semantics). Fixed round
    * count — LPA oscillates on bipartite structures, so callers pick
    * rounds (≈ diameter) rather than waiting on a fixpoint.
    *
    * Scale: per round one edge-keyed label join + one (node, label)
    * count aggregation + the per-node argmax — all sort-merge/partial-
    * aggregable; per-round localCheckpoint keeps the plan flat (the
    * pageRank convention). Output: (v, community).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 3, checkpointEvery: Int = 8): DataFrame = {
    require(rounds >= 1 && checkpointEvery >= 1)
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    // the node census is referenced once (label init) — it folds into the
    // lazy round chain, no scaffold checkpoint of its own
    var lab = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    var lastEager: DataFrame = null
    for (i <- 1 to rounds) {
      val votes = sym.join(lab.select(col("v").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("v"), col("label"))
        .agg(count(lit(1)).as("_cnt"))
      lab = votes.groupBy(col("v"))
        .agg(max(struct(col("_cnt").as("c"), (-col("label")).as("nl"),
          col("label").as("l"))).as("_w"))
        .select(col("v"), col("_w.l").as("label"))
      // rounds chain LAZILY (single-reference chain — nothing recomputes);
      // an eager checkpoint every `checkpointEvery` rounds — and on the
      // last — bounds plan depth at ⌈rounds/checkpointEvery⌉ jobs instead
      // of one per round (the pageRank discipline)
      if (i % checkpointEvery == 0 || i == rounds) {
        lab = lab.localCheckpoint()
        if (lastEager != null) org.apache.spark.sql.GraftBridge.freeCheckpoint(lastEager)
        lastEager = lab
      }
    }
    val out = lab.select(col("v"), col("label").as("community"))
    org.apache.spark.sql.GraftBridge.freeCheckpoint(sym)
    out
  }

  /** Time-weighted average (TWAP) over an IRREGULAR series: each
    * observation holds until the next one, so its weight is the exact
    * integer-µs duration to the successor (one lead window per key; the
    * final observation has no holding interval and drops — the standard
    * convention). The weighted sum is DECIMAL (milli-scaled values ×
    * µs durations — order-independent), and TWAP itself is one final
    * IEEE division. The mean a plain avg() gets WRONG whenever sampling
    * is irregular — sensor data, prices, any event stream.
    * Output per key: n_intervals, total_dur_us, twap.
    */
  def timeWeightedAvg(df: DataFrame, key: Column, tsUs: Column, tiebreak: Column,
                      valueMilli: Column): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("_ts"), col("_rk"))
    df.select(key.as("key"), tsUs.cast("long").as("_ts"), tiebreak.as("_rk"),
        valueMilli.cast("long").as("_v"))
      .withColumn("_dur", lead(col("_ts"), 1).over(w) - col("_ts"))
      .where(col("_dur").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("_dur")).as("total_dur_us"),
        (sum(col("_v").cast("decimal(18,0)") * col("_dur").cast("decimal(18,0)"))
          .cast("double") / sum(col("_dur")).cast("double")).as("twap_milli"))
  }

  /** k-anonymity / l-diversity audit — the privacy gate before a dataset
    * leaves the pipeline (pairs with the GDPR delete path): group rows by
    * the quasi-identifier tuple, then census the group-size bands
    * (singletons are re-identifiable; k<5 is the classic release
    * threshold) and count the groups that fail l-diversity (≥2 members
    * but fewer than `lMin` distinct sensitive values — attribute
    * disclosure even when k holds). ONE corpus shuffle to the QI group
    * table; the census is a bounded second fold. All counts exact
    * integers. countDistinct per group is the honest cost — the group
    * table is corpus-sized in the worst case but each group's distinct
    * set is tiny.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[Column], sensitive: Column,
                      lMin: Int = 2): DataFrame = {
    require(qiCols.nonEmpty && lMin >= 2)
    val g = df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("_sz"), countDistinct(sensitive).as("_ldiv"))
    val band = when(col("_sz") === 1, "1")
      .when(col("_sz") < 5, "2-4")
      .when(col("_sz") < 10, "5-9")
      .otherwise("10+")
    g.groupBy(band.as("band"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("_sz")).as("n_rows"),
        sum(when(col("_sz") >= 2 && col("_ldiv") < lMin, 1L).otherwise(0L))
          .as("n_low_diversity"))
  }

  /** HITS (Kleinberg hubs & authorities) as a FIXED-POINT iteration —
    * the [[graft.ops.Dedup.pageRankFixedPoint]] discipline applied to the
    * two-score recurrence: every value is a scaled long, per-round
    * sum-normalization is `x · scale div Σx` (integer floor), so hub and
    * authority scores are BIT-IDENTICAL across engines, partition orders,
    * and replays — replayable in unrolled SQL CTEs. Multigraph semantics:
    * parallel edges contribute once each (the natural weight).
    *
    * Overflow contract: a raw authority sum is ≤ E·scale and the
    * normalization multiplies by scale again, so E·scale² must stay
    * < 2⁶³ — the default scale 10⁶ is safe to ~9·10⁶ edges; drop scale
    * as E grows (precision 1/scale is a RANKING tolerance, not a sum).
    * Lower bound: `scale` must also EXCEED the node count on
    * near-uniform graphs, or per-node floors collapse the next round's
    * sum to 0 — guarded in-plan (raise_error), never a silent NULL.
    *
    * Scale shape: per round, two edge-keyed aggregations (sort-merge,
    * partial-combined) and two 1-row scalar sums broadcast back. Rounds
    * chain LAZILY with per-half-round lazy checkpoints (each score frame
    * is referenced twice — persisted on first compute, read on the
    * second) and materialize in ONE job; an eager cut every
    * `checkpointEvery` rounds bounds the pinned footprint for large
    * iteration counts (the pageRank convention). No data ever collects
    * to the driver.
    */
  def hitsFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                     iters: Int = 3, scale: Long = 1000000L,
                     checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1 && scale > 0 && checkpointEvery >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
      .distinct().localCheckpoint(eager = false)
    require(nodes.count() > 0, "hitsFixedPoint: empty edge set")
    // every normalized score frame is referenced TWICE (the next half-round
    // AND either the following round or the final join), so each carries a
    // LAZY checkpoint: first computation during the consumer's job persists
    // it, the second reference reads blocks — no per-round driver job, no
    // double compute. Freed in one sweep after the final materialization.
    val lazyCps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def normalized(full: DataFrame, c: String, out: String): DataFrame = {
      val s = full.agg(sum(col(c)).as("_s"))
      // Σx can floor to 0 when node count exceeds `scale` with
      // near-uniform scores (each x·scale < Σx rounds to 0 the PREVIOUS
      // round, then this round's sum is 0 and `div` would yield NULL,
      // silently nulling every score). Fail loudly in-plan instead —
      // no extra driver job; the fix is a larger `scale` (> node count).
      val norm = full.crossJoin(broadcast(s))
        .select(col("v"),
          when(col("_s") > 0, expr(s"$c * ${scale}L div _s"))
            .otherwise(raise_error(lit(
              "hitsFixedPoint: normalization sum collapsed to 0 — " +
                "scale must exceed the node count for near-uniform graphs")))
            .as(out))
        .localCheckpoint(eager = false)
      lazyCps += norm
      norm
    }
    var hub = nodes.select(col("v"), lit(scale).as("h"))
    var auth: DataFrame = null
    var lastEagerCut: DataFrame = null
    for (i <- 1 to iters) {
      val aRaw = e.join(hub.select(col("v").as("src"), col("h")), "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("_a"))
      val aFull = nodes.join(aRaw.select(col("dst").as("v"), col("_a")), Seq("v"), "left")
        .select(col("v"), coalesce(col("_a"), lit(0L)).as("_a"))
      val aNorm = normalized(aFull, "_a", "a")
      val hRaw = e.join(aNorm.select(col("v").as("dst"), col("a")), "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("_h"))
      val hFull = nodes.join(hRaw.select(col("src").as("v"), col("_h")), Seq("v"), "left")
        .select(col("v"), coalesce(col("_h"), lit(0L)).as("_h"))
      var hNorm = normalized(hFull, "_h", "h")
      // bound the pinned lazy-block footprint for large iteration counts:
      // an eager cut every `checkpointEvery` rounds materializes + frees
      // everything accumulated so far, INCLUDING the previous cut's eager
      // frame (its blocks rooted the chain this cut just materialized past)
      // — pinned state stays O(|nodes|), never O(cuts·|nodes|)
      if (i % checkpointEvery == 0 && i < iters) {
        hNorm = hNorm.localCheckpoint()
        lazyCps.foreach(org.apache.spark.sql.GraftBridge.freeCheckpoint)
        lazyCps.clear()
        if (lastEagerCut != null)
          org.apache.spark.sql.GraftBridge.freeCheckpoint(lastEagerCut)
        lastEagerCut = hNorm
      }
      hub = hNorm; auth = aNorm
    }
    // ONE materialization job for the whole lazy chain, then free every
    // intermediate round's blocks — the returned frame is flat
    val out = hub.join(auth, "v")
      .select(col("v"), col("h").as("hub"), col("a").as("authority"))
      .localCheckpoint()
    lazyCps.foreach(org.apache.spark.sql.GraftBridge.freeCheckpoint)
    if (lastEagerCut != null)
      org.apache.spark.sql.GraftBridge.freeCheckpoint(lastEagerCut)
    org.apache.spark.sql.GraftBridge.freeCheckpoint(e)
    org.apache.spark.sql.GraftBridge.freeCheckpoint(nodes)
    out
  }

  /** CUSUM change-point detection (one-sided upper), exactly, in ONE
    * window pass: the textbook recursion s_k = max(0, s_{k−1} + dev_k) is
    * not window-expressible, but it equals `S_k − min_{j≤k} S_j` for
    * S = running sum of deviations — so two frames over one sort give the
    * exact CUSUM statistic with NO iterative loop. Deviations are integer
    * (caller pre-scales the measure to milli-units, the floor(v·1000)
    * float discipline): dev = v − target − slack, with the per-key target
    * the integer-floor mean (`sum div n` — exact in both engines).
    * Output per key: n_points, target_milli, max_cusum, n_alarms
    * (cusum > threshold), first_alarm_ts (NULL when none).
    *
    * Scale: one aggregation for targets (bounded key domain broadcasts
    * back), one partitioned sort for the windows, one final bounded
    * aggregate. A key's series must fit a task's sort — the op_ntile
    * caveat; partition further by time range for unbounded series.
    */
  def cusumAlarms(df: DataFrame, key: Column, tsUs: Column, tiebreak: Column,
                  valueMilli: Column, slackMilli: Long, thresholdMilli: Long): DataFrame = {
    val base = df.select(key.as("key"), tsUs.cast("long").as("_ts"),
      tiebreak.as("_rk"), valueMilli.cast("long").as("_v"))
    val tgt = base.groupBy(col("key"))
      .agg(sum(col("_v")).as("_sv"), count(lit(1)).as("_n"))
      .select(col("key").as("_tk"), expr("_sv div _n").as("target_milli"))
    val w = Window.partitionBy(col("key")).orderBy(col("_ts"), col("_rk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // null-safe: a NULL-key group's target row must match back (see the
    // seasonalAnomaly join-back note)
    val scored = base.join(broadcast(tgt), col("key") <=> col("_tk"))
      .withColumn("_s", sum(col("_v") - col("target_milli") - lit(slackMilli)).over(w))
      // the empty prefix S_0 = 0 is a valid minimum candidate (s_1 =
      // max(0, dev_1), not dev_1 − dev_1): clamp the running min at 0
      .withColumn("_cusum", col("_s") - least(min(col("_s")).over(w), lit(0L)))
    scored.groupBy(col("key"))
      .agg(count(lit(1)).as("n_points"),
        first(col("target_milli")).as("target_milli"),
        max(col("_cusum")).as("max_cusum"),
        sum(when(col("_cusum") > thresholdMilli, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("_cusum") > thresholdMilli, col("_ts"))).as("first_alarm_ts"))
  }

  /** Time-bar resample (OHLC): bucket a value stream into fixed bars per
    * key — open/close via `min_by`/`max_by` on the (ts, tiebreak) struct
    * (ONE shuffle, partial-aggregable — never a window pass over the
    * corpus), high/low as plain min/max, the bar sum through DECIMAL so
    * it is summation-order exact. `tiebreak` must be a stable unique row
    * id (the [[windowFunnel3]] convention): min_by on a tied struct would
    * otherwise pick by partition layout.
    *
    * Scale: bars×keys is time-domain-bounded (not SF-growing), but the
    * aggregation itself distributes over the full stream — each executor
    * folds its slice into per-(key, bar) partials before the exchange.
    */
  def ohlcBars(df: DataFrame, key: Column, tsUs: Column, tiebreak: Column,
               value: Column, barUs: Long): DataFrame = {
    require(barUs >= 1)
    val ts = tsUs.cast("long")
    val ord = struct(ts.as("t"), tiebreak.as("r"))
    df.groupBy(key.as("key"), (ts - pmod(ts, lit(barUs))).as("bar_us"))
      .agg(
        min_by(value, ord).as("open"),
        max(value).as("high"),
        min(value).as("low"),
        max_by(value, ord).as("close"),
        count(lit(1)).as("n_events"),
        sum(value.cast("decimal(24,6)")).cast("double").as("sum_value"))
  }
}
