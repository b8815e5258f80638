package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.functions.Geo

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("haversine is finite at (near-)antipodal points — clamp prevents asin(>1) NaN") {
    // antipodal pairs push the sum-of-squares term to 1 ± ulp; unclamped,
    // asin(sqrt(1+ulp)) = NaN and every <= radius predicate silently fails
    val pts = Seq(
      (10.0, 20.0, -10.0, -160.0),   // exactly antipodal
      (45.0, 30.0, -45.0, -150.0),   // exactly antipodal
      (89.99, 0.0, -89.99, 180.0),   // near-antipodal pole pair
      (0.0, 0.0, 0.0, 180.0)).toDF("lat1", "lon1", "lat2", "lon2")
    val d = pts.select(Geo.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .as[Double].collect()
    val halfCircumference = math.Pi * Geo.EarthRadiusKm
    assert(d.forall(x => !x.isNaN && x <= halfCircumference + 1e-6),
      s"expected finite distances <= half circumference, got ${d.mkString(",")}")
    assert(d.forall(x => math.abs(x - halfCircumference) < 1.0),
      "antipodal distance must be ~half the circumference")
  }

  test("op16: grid-bucketed radius join == brute-force haversine filter") {
    val left = Tables.load(spark, sf0001, "customer")
      .select($"c_custkey", (($"c_custkey" * 7 % 1200) / 10.0 - 60.0).as("lat"),
        (($"c_custkey" * 13 % 3000) / 10.0 - 150.0).as("lon"))
    val right = Tables.load(spark, sf0001, "supplier")
      .select($"s_suppkey", (($"s_suppkey" * 91 % 1200) / 10.0 - 60.0).as("lat"),
        (($"s_suppkey" * 53 % 3000) / 10.0 - 150.0).as("lon"))
    val bucketed = Joins.radiusJoin(left, right, left("lat"), left("lon"), right("lat"), right("lon"),
        300.0, 3.0, 6.0)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(right)
      .where(Geo.haversineKm(left("lat"), left("lon"), right("lat"), right("lon")) <= 300.0)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSet
    assert(bucketed == brute)
    assert(brute.nonEmpty)
  }

  test("op16: radius join fails loudly when a row's latitude exceeds the declared bound") {
    val left = Seq((1L, 70.5, 10.0)).toDF("id", "lat", "lon")   // beyond default maxAbsLatDeg=60
    val right = Seq((2L, 59.0, 10.0)).toDF("id2", "lat", "lon")
    val joined = Joins.radiusJoin(left, right, left("lat"), left("lon"),
      right("lat"), right("lon"), 300.0, 3.0, 6.0)
    val e = intercept[Exception](joined.collect())
    assert(e.getMessage.contains("maxAbsLatDeg") ||
      Option(e.getCause).exists(_.getMessage.contains("maxAbsLatDeg")))
    // NULL latitude keeps its semantics: joins nothing, raises nothing
    val withNull = Seq((1L, Option.empty[Double], Option(10.0))).toDF("id", "lat", "lon")
    assert(Joins.radiusJoin(withNull, right, withNull("lat"), withNull("lon"),
      right("lat"), right("lon"), 300.0, 3.0, 6.0).count() == 0)
  }

  test("asof join attaches greatest build ts <= probe ts per key, ties build-wins, null when none") {
    val probe = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 10L, 40L), (4L, 99L, 10L))
      .toDF("event_id", "user_id", "ts_us")
    val build = Seq((10L, 90L), (10L, 40L), (10L, 100L)).toDF("user_id", "ts_us")
    val got = Joins.asofLastPrior(probe, build, "user_id", "ts_us", "asof")
      .select("event_id", "asof").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(40L), 3L -> Some(40L), 4L -> None))
  }

  test("asof join: NULL keys never match (join semantics) — a NULL-key probe gets NULL asof") {
    // the window partition groups both sides' NULL keys together; the
    // build side's NULL-key rows are dropped so probe rows keep the NULL
    // asof that JOIN equality (and DuckDB ASOF JOIN) gives them
    val probe = Seq((1L, Option.empty[Long], 200L), (2L, Option(10L), 200L))
      .toDF("event_id", "user_id", "ts_us")
    val build = Seq((Option.empty[Long], 100L), (Option(10L), 90L)).toDF("user_id", "ts_us")
    val got = Joins.asofLastPrior(probe, build, "user_id", "ts_us", "asof")
      .select("event_id", "asof").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(90L)),
      s"NULL-key probe must not inherit a NULL-key build row's ts, got $got")
  }

  test("helper-name guards: reserved join helper columns fail loudly instead of clobbering user data") {
    val df = Seq((1L, 2.0)).toDF("id", "_rb")
    val iv = Seq((0.0, 5.0)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException] {
      Joins.rangeJoin(df, col("id"), iv, col("lo"), col("hi"), 1.0)
    }
    assert(e.getMessage.contains("_rb"))
  }

  test("op20: anti-join ledger = discovered minus imported") {
    val discovered = Seq("a", "b", "c").toDF("path")
    val imported = Seq("b").toDF("path")
    assert(Joins.antiJoin(discovered, imported, Seq("path")).as[String].collect().toSet == Set("a", "c"))
  }

  test("op15: broadcast lookup join drops unmatched keys (inner) and plan broadcasts") {
    val big = Seq(("01007", 1), ("99999", 2)).toDF("insee", "v")
    val small = Seq(("01007", 47.0)).toDF("code", "lat")
    val joined = Joins.broadcastLookup(big, small, $"insee" === $"code")
    assert(joined.count() == 1)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("skew-salted join matches the plain equi-join result under extreme key skew") {
    val big = spark.range(0, 10000).select((($"id" % 3) === 0).cast("int").as("k"), $"id".as("v"))
    val small = Seq((0, "cold"), (1, "hot")).toDF("k", "tag")
    val salted = Joins.skewSaltedJoin(big, small, Seq("k"), saltFactor = 8)
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    val plain = big.join(small, Seq("k"))
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
    // the plan actually salts: the join's shuffle key set includes _salt,
    // so a hot key spreads over saltFactor reducers instead of one
    val plan = Joins.skewSaltedJoin(big, small, Seq("k"), saltFactor = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "join keys must include the salt column")
    // and the big side's hot key really lands in >1 partition post-salt —
    // measured with AQE off (on test-sized data AQE coalesces the tiny
    // salted shuffle back into one partition, hiding the spread that is
    // the operator's whole point at scale)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val spread = Joins.skewSaltedJoin(big, small, Seq("k"), saltFactor = 8)
        .where($"tag" === "cold")
        .select(org.apache.spark.sql.functions.spark_partition_id()).distinct().count()
      assert(spread > 1, s"hot key stayed in $spread partition(s)")
      // BYTE-IDENTICAL hot rows (a frame pre-pruned to just the join
      // column) must still spread: a pure row-content salt hashes them
      // all to ONE value, putting the whole hot key back on one reducer
      val dupBig = spark.range(0, 4000).select(lit(1).as("k"))
      val dupSpread = Joins.skewSaltedJoin(dupBig, small, Seq("k"), saltFactor = 8)
        .select(org.apache.spark.sql.functions.spark_partition_id()).distinct().count()
      assert(dupSpread > 1, s"identical hot rows stayed in $dupSpread partition(s)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("pipeline stages compose lazily in order") {
    import graft.pipeline.Pipeline
    val p = Pipeline.start
      .stage("filter")(_.where($"id" % 2 === 0))
      .stage("double")(_.withColumn("v", $"id" * 2))
    assert(p.names == Seq("filter", "double"))
    val out = p.run(spark.range(0, 10).toDF())(_.agg(sum($"v")).as[Long].head())
    assert(out == 40) // 0+4+8+12+16
  }

  test("range join: banded point-in-interval == brute-force theta join") {
    val p = spark.range(0, 500).select($"id", ($"id" * 17 % 1000).as("pt"))
    val iv = spark.range(0, 30).select($"id".as("iid"),
      ($"id" * 97 % 900).as("lo"), ($"id" * 97 % 900 + 80).as("hi"))
    val banded = Joins.rangeJoin(p, $"pt", iv, $"lo", $"hi", 100.0)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    val brute = p.crossJoin(iv).where($"pt" >= $"lo" && $"pt" <= $"hi")
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(banded == brute && brute.nonEmpty)
  }

  test("fuzzyJoin matches within edit distance via prefix blocks; cross-block pairs missed by design") {
    val l = Seq((1L, "smith"), (2L, "smyth"), (3L, "jones"), (4L, "zzzzz")).toDF("lid", "name")
    val r = Seq((10L, "smith"), (11L, "jonez"), (12L, "asmith")).toDF("rid", "rname")
    val got = Joins.fuzzyJoin(l, r, col("name"), col("rname"), maxDist = 1, blockLen = 2)
      .select("lid", "rid", "edit_dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 10L, 0), // exact
      (2L, 10L, 1), // "smyth" ~ "smith": one substitution inside the "sm" block
      (3L, 11L, 1)  // "jones" ~ "jonez", same "jo" block
    ))
    val wide = Joins.fuzzyJoin(l, r, col("name"), col("rname"), maxDist = 2, blockLen = 2)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // ...but "asmith" vs "smith" (distance 1, different first chars) is
    // missed at any blockLen >= 1: the documented blocking recall tradeoff
    assert(!got.exists(g => g._1 == 1L && g._2 == 12L) && !wide.contains((1L, 12L)))
  }

  test("intervalOverlapJoin: banded == brute force, each pair exactly once, across bucket sizes") {
    val rnd = new scala.util.Random(7)
    val as = (1 to 60).map(i => (i.toLong, rnd.nextInt(300).toLong))
      .map { case (id, lo) => (id, lo, lo + rnd.nextInt(25)) }
    val bs = (1 to 80).map(i => (i.toLong, rnd.nextInt(300).toLong))
      .map { case (id, lo) => (id, lo, lo + rnd.nextInt(15)) }
    val a = as.toDF("a_id", "a_lo", "a_hi")
    val b = bs.toDF("b_id", "b_lo", "b_hi")
    val brute = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if math.max(alo, blo) <= math.min(ahi, bhi)
    } yield (ai, bi)).toSet
    for (bucket <- Seq(1.0, 8.0, 50.0, 1000.0)) {
      val got = Joins.intervalOverlapJoin(a, col("a_lo"), col("a_hi"),
          b, col("b_lo"), col("b_hi"), bucket)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"bucket $bucket emitted duplicate pairs")
      assert(got.toSet == brute, s"bucket $bucket: banded != brute")
    }
  }

  test("longestPrefixMatch: most-specific route wins, ties take smallest id, unmatched drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 10.0.0.0/8 (rid 1), 10.1.0.0/16 (rid 2), duplicate /16 (rid 3),
    // 192.168.0.0/16 (rid 4)
    def ip(a: Int, b: Int, c: Int, d: Int): Long =
      (a.toLong << 24) | (b.toLong << 16) | (c.toLong << 8) | d.toLong
    // networks are RAW 32-bit CIDR base addresses — the op masks the host
    // bits itself; rid 4's deliberately-sloppy low bit must be masked off
    val routes = Seq(
      (1L, 8, ip(10, 0, 0, 0)),
      (2L, 16, ip(10, 1, 0, 0)),
      (3L, 16, ip(10, 1, 0, 0)),
      (4L, 16, ip(192, 168, 0, 1))).toDF("rid", "plen", "network")
    val keys = Seq(ip(10, 1, 2, 3), ip(10, 9, 9, 9), ip(192, 168, 1, 1), ip(8, 8, 8, 8))
      .toDF("k")
    val got = graft.ops.Joins.longestPrefixMatch(keys, col("k"), routes,
        col("network"), col("plen"), col("rid"))
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(ip(10, 1, 2, 3)) === ((2L, 16)), "the /16 must beat the /8; rid tie -> smallest")
    assert(got(ip(10, 9, 9, 9)) === ((1L, 8)))
    assert(got(ip(192, 168, 1, 1)) === ((4L, 16)))
    assert(!got.contains(ip(8, 8, 8, 8)), "a key covered by no route must drop")
  }
}
