package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive radius θ-join —
  * `Filter(haversine(l, r) <= radius, CrossJoin(L, R))` — into a latitude-
  * banded equi-join.
  *
  * The naive plan is a Cartesian/broadcast-nested-loop product: O(|L|·|R|)
  * haversine evaluations. Any two points within `radius` km differ in
  * latitude by at most radius/111.195 degrees (the great-circle angle is at
  * least the latitude delta), so banding both sides into
  * `cell = floor(lat / cellSize)` with `cellSize >= radius/111.195` and
  * replicating the right side into cells {c-1, c, c+1} guarantees every
  * qualifying pair meets in an equi-join on the band — turning the product
  * into a hash join with a constant 3× replication of one side. The exact
  * haversine filter is re-applied above, so the rewrite is semantics-
  * preserving for ANY input (no longitude assumptions — unlike 2-D gridding,
  * latitude banding needs no cos(lat) bound).
  *
  * This is the reference's flagship analytic (deaths within 10 km of a power
  * plant, docs/Report.md:85-89) made safe to write naively.
  *
  * Fires only on condition-less Inner/Cross joins; the rewritten join has an
  * equi-condition, so the rule cannot re-fire on its own output.
  */
object RadiusJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  // cell size is derived from the matched 2R multiplier (below), so the
  // rewrite is unit-agnostic: whatever radius unit the formula uses, the
  // latitude bound is r / (R·π/180) degrees

  /** Matches the canonical haversine comparison built by graft.functions.Geo
    * — `2R * asin(sqrt(sin²(Δlat/2) + cos(lat1)cos(lat2)sin²(Δlon/2))) <= r`
    * after analyzer type-coercion and constant folding — yielding
    * (lat1, lon1, lat2, lon2, radius, twoR); radius and the matched `2R`
    * literal share whatever unit the user's formula uses.
    */
  private object HaversinePredicate {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double, Double)] = e match {
      case LessThanOrEqual(Haversine(lat1, lon1, lat2, lon2, twoR), DoubleLit(r)) => Some((lat1, lon1, lat2, lon2, r, twoR))
      case LessThan(Haversine(lat1, lon1, lat2, lon2, twoR), DoubleLit(r)) => Some((lat1, lon1, lat2, lon2, r, twoR))
      case GreaterThanOrEqual(DoubleLit(r), Haversine(lat1, lon1, lat2, lon2, twoR)) => Some((lat1, lon1, lat2, lon2, r, twoR))
      case GreaterThan(DoubleLit(r), Haversine(lat1, lon1, lat2, lon2, twoR)) => Some((lat1, lon1, lat2, lon2, r, twoR))
      case _ => None
    }
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, _) => Some(v)
      case Cast(Literal(v: Double, _), _, _, _) => Some(v)
      case _ => None
    }
  }

  private object HalfAngleSinSq {
    /** sin²(radians(b − a) / 2) → (a, b) */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Pow(Sin(Divide(ToRadians(Subtract(b, a, _)), DoubleLit(d), _)), DoubleLit(p)) if d == 2.0 && p == 2.0 =>
        Some((a, b))
      case _ => None
    }
  }

  private object Haversine {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double)] = e match {
      case Multiply(DoubleLit(twoR), Asin(Sqrt(Add(
            HalfAngleSinSq(lat1, lat2),
            Multiply(Multiply(Cos(ToRadians(cl1)), Cos(ToRadians(cl2)), _), HalfAngleSinSq(lon1, lon2), _), _))), _)
          if cl1.semanticEquals(lat1) && cl2.semanticEquals(lat2) =>
        Some((lat1, lon1, lat2, lon2, twoR))
      case _ => None
    }
  }

  /** By the time user optimizer rules run, `PushPredicateThroughJoin` has
    * folded the filter into the join condition, so the pattern is a
    * Cross/Inner join whose condition contains the haversine conjunct (and
    * no equi-conjunct — those joins are already hash-joinable).
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Cross | Inner, Some(cond), _) if !hasEquiCondition(left, right, cond) =>
      val hit = splitConjunctivePredicates(cond).collectFirst {
        case p @ HaversinePredicate(lat1, lon1, lat2, lon2, r, twoR) if r > 0 && twoR > 0 &&
            lat1.references.subsetOf(left.outputSet) && lon1.references.subsetOf(left.outputSet) &&
            lat2.references.subsetOf(right.outputSet) && lon2.references.subsetOf(right.outputSet) =>
          (lat1, lat2, r, twoR)
      }
      hit match {
        case Some((lat1, lat2, r, twoR)) =>
          // great-circle distance >= (twoR/2)·Δlat_rad, so
          // Δlat_deg <= 360·r / (π·twoR) regardless of the radius unit;
          // 0.1% slack absorbs last-ulp rounding in the evaluated haversine
          // so a borderline pair can never land two bands apart
          val cellSize = Literal(math.max(360.0 * r / (math.Pi * twoR) * 1.001, 1e-9))
          val lCell = Alias(Floor(Divide(lat1, cellSize)), "_graft_band")()
          val newLeft = Project(left.output :+ lCell, left)
          val delta = AttributeReference("_graft_delta", LongType)()
          val gen = Generate(
            Explode(CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(delta), child = right)
          val rCell = Alias(Add(Floor(Divide(lat2, cellSize)), delta), "_graft_band_r")()
          val newRight = Project(right.output :+ rCell, gen)
          val banded = Join(newLeft, newRight, Inner,
            Some(EqualTo(lCell.toAttribute, rCell.toAttribute)), JoinHint.NONE)
          // exact original predicate above the banded join; restore output
          Project(j.output, Filter(cond, banded))
        case None => j
      }
  }

  /** An equi-conjunct with keys on opposite sides already makes the join
    * hash-joinable — the rewrite would only add overhead (and fire on its
    * own output).
    */
  private def hasEquiCondition(left: LogicalPlan, right: LogicalPlan, cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    }
}

/** Install hooks.
  *
  * - `GraftExtensions`: for `spark.sql.extensions=graft.plans.GraftExtensions`
  *   or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * - `Graft.install(spark)`: attach to an already-running session via
  *   `experimental.extraOptimizations` (same optimizer batch).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RadiusJoinRule)
}

/** The haversine formula as a raw Catalyst tree (same shape as
  * graft.functions.Geo.haversineKm builds via Columns) — needed where a
  * resolved Expression is required, e.g. FunctionRegistry lambdas.
  */
object GeoExprs {
  def haversineKm(lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression): Expression = {
    val dLat = Divide(ToRadians(Subtract(lat2, lat1)), Literal(2.0))
    val dLon = Divide(ToRadians(Subtract(lon2, lon1)), Literal(2.0))
    val a = Add(
      Pow(Sin(dLat), Literal(2.0)),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))), Pow(Sin(dLon), Literal(2.0))))
    Multiply(Literal(2 * graft.functions.Geo.EarthRadiusKm), Asin(Sqrt(a)))
  }
}

object Graft {
  def install(spark: SparkSession): SparkSession = {
    if (!spark.experimental.extraOptimizations.contains(RadiusJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RadiusJoinRule
    registerSqlFunctions(spark)
    spark
  }

  /** Expose the engine's scalar functions to `spark.sql` users:
    * `graft_cosine_sim(a, b)`, `graft_dot(a, b)`,
    * `graft_haversine_km(lat1, lon1, lat2, lon2)`.
    */
  def registerSqlFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine_sim",
      es => graft.functions.CosineSimExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      es => graft.functions.DotProductExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_haversine_km",
      es => GeoExprs.haversineKm(es(0), es(1), es(2), es(3)), "built-in")
  }
}
