package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite naive SQL interval joins into the
  * bucketed range-join plan `Timeseries.rangeJoin` spells by hand.
  *
  * A user writing the obvious SQL —
  *
  *   SELECT ... FROM clicks c JOIN views v
  *     ON c.user_id = v.user_id
  *    AND v.tus >= c.tus - 3600000000 AND v.tus <= c.tus
  *
  * — gets a SortMergeJoin on user_id with the interval as a post-join
  * FILTER: every click of a hot user pairs with every view of that user
  * before the filter runs (per-key quadratic; RangeBench measures the
  * blow-up at 523M enumerated pairs vs 1.45M for the same 5M-event
  * corpus). This rule detects the shape (inner join; at least one
  * cross-side equi key; two literal-bounded comparison conjuncts pinning
  * `rts - lts` into [lo, hi] over LongType columns) and rewrites:
  *
  *   1. bucket width W = hi - lo; right rows land in floor(rts / W);
  *   2. left rows EXPLODE to the (at most two) buckets their window
  *      touches — sequence(floor((lts+lo)/W), floor((lts+hi)/W));
  *   3. join gains the bucket equality; the ORIGINAL condition stays as
  *      the exact filter, so semantics are untouched;
  *   4. a final Project restores the join's exact output schema.
  *
  * Same exchange count as the naive plan (one per side), left at most
  * doubled, and fan-out bounded by rows-per-bucket instead of
  * rows-per-key — the Databricks range-join-hint binning, derived
  * automatically. floor division is spelled (x - pmod(x, W)) div W, exact
  * for negative epochs too (plain `div` truncates toward zero).
  * Strict bounds (<, >) reuse the inclusive window — a superset is safe
  * because the original comparisons still filter exactly.
  *
  * Fires on LongType interval columns (epoch micros/millis, the lakehouse
  * norm) AND on timestamp columns (LTZ and NTZ): `ts - INTERVAL '1' HOUR`
  * reaches the optimizer constant-folded into
  * TimestampAddInterval(ts, day-time literal) whose value is exactly
  * micros, and buckets derive from unix_micros (NTZ through an
  * explicit-zone cast) — monotone and exact, so the two-buckets-per-window
  * guarantee is unchanged.
  * Idempotence: the rewritten join's bucket attributes carry a marker
  * name the eligibility check refuses, and the rule also stands down on
  * the `_b`/`_lus`/`_rus` internals of a hand-spelled rangeJoin.
  *
  * Registered per-session via `RangeJoinRewrite.register(spark)`
  * (experimental.extraOptimizations) or process-wide through
  * `graft.functions.GraftExtensions` (spark.sql.extensions).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val bucketName = "__graft_range_bucket"
  private val internalNames =
    Set(bucketName, s"${bucketName}_l", "_b", "_lus", "_rus")

  /** Idempotent live-session registration. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  private def isTs(a: AttributeReference): Boolean =
    a.dataType == TimestampType || a.dataType == TimestampNTZType

  /** e as (attr, offset) over one LongType or timestamp attribute: a,
    * a + k, k + a, a - k (k literal; raw units for longs, MICROSECONDS for
    * timestamps — `ts - INTERVAL '1' HOUR` reaches the optimizer folded
    * into TimestampAddInterval(ts, day-time literal), whose value IS
    * micros). */
  private def term(e: Expression): Option[(AttributeReference, Long)] = e match {
    case a: AttributeReference if a.dataType == LongType || isTs(a) => Some((a, 0L))
    case ta: TimestampAddInterval =>
      ta.children match {
        case Seq(a: AttributeReference, Literal(us: Long, _: DayTimeIntervalType))
            if isTs(a) => Some((a, us))
        case _ => None
      }
    case Add(x, y, _) =>
      (term(x), litLong(y)) match {
        case (Some((a, o)), Some(v)) if !isTs(a) => Some((a, o + v))
        case _ =>
          (litLong(x), term(y)) match {
            case (Some(v), Some((a, o))) if !isTs(a) => Some((a, o + v))
            case _ => None
          }
      }
    case Subtract(x, y, _) =>
      (term(x), litLong(y)) match {
        case (Some((a, o)), Some(v)) if !isTs(a) => Some((a, o - v))
        case _ => None
      }
    case _ => None
  }

  /** A comparison conjunct as a bound on (rts - lts): returns
    * (lts, rts, isLower, delta) meaning rts - lts >= delta when isLower,
    * rts - lts <= delta otherwise. */
  private def asBound(e: Expression, leftOut: AttributeSet, rightOut: AttributeSet)
      : Option[(AttributeReference, AttributeReference, Boolean, Long)] = {
    def sides(x: Expression, y: Expression, geq: Boolean) =
      (term(x), term(y)) match {
        case (Some((ax, ox)), Some((ay, oy))) =>
          if (rightOut.contains(ax) && leftOut.contains(ay))
            Some((ay, ax, geq, oy - ox)) // rts + ox OP lts + oy
          else if (leftOut.contains(ax) && rightOut.contains(ay))
            Some((ax, ay, !geq, ox - oy)) // lts + ox OP rts + oy (flip)
          else None
        case _ => None
      }
    e match {
      case GreaterThanOrEqual(x, y) => sides(x, y, geq = true)
      case GreaterThan(x, y) => sides(x, y, geq = true)
      case LessThanOrEqual(x, y) => sides(x, y, geq = false)
      case LessThan(x, y) => sides(x, y, geq = false)
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.exists(_.references.exists(a => internalNames.contains(a.name))))
      return None
    val leftOut = left.outputSet
    val rightOut = right.outputSet
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
          (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut) &&
            a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }
    if (!hasEqui) return None
    val bounds = conjuncts.flatMap(asBound(_, leftOut, rightOut))
    val best = bounds.groupBy(b => (b._1.exprId, b._2.exprId)).values.flatMap { bs =>
      val los = bs.filter(_._3).map(_._4)
      val his = bs.filterNot(_._3).map(_._4)
      if (los.nonEmpty && his.nonEmpty) {
        val (lo, hi) = (los.max, his.min)
        if (hi > lo) Some((bs.head._1, bs.head._2, lo, hi)) else None
      } else None
    }.toSeq.sortBy(t => (t._1.exprId.id, t._2.exprId.id)).headOption

    best.map { case (lts, rts, lo, hi) =>
      val w = Literal(hi - lo, LongType)
      def floorDiv(x: Expression): Expression =
        new IntegralDivide(new Subtract(x, new Pmod(x, w)), w)
      // bucket source: the attr itself for longs; exact epoch micros for
      // LTZ timestamps. NTZ comparisons happen in the LOCAL domain, so the
      // bucket must be the raw LOCAL micros: cast through the FIXED zone
      // "UTC" (local value reinterpreted as a UTC instant => unix_micros IS
      // the local micros). Casting through the SESSION zone instead would
      // be monotone but not shift-invariant — across a DST fall-back the
      // instant-domain gap between two local values exceeds their local
      // gap, a window could straddle 3 buckets, and matching pairs would
      // silently vanish. A fixed-offset zone is affine, so the
      // <= 2-buckets-per-window guarantee carries over exactly. (The cast
      // needs SOME explicit zone either way: a post-analysis Cast is
      // otherwise left zoneless and unresolved, the Sequence lesson.)
      def micros(a: AttributeReference): Expression =
        if (!isTs(a)) a
        else if (a.dataType == TimestampNTZType)
          UnixMicros(Cast(a, TimestampType, Some("UTC")))
        else UnixMicros(a)
      val rAlias = Alias(floorDiv(micros(rts)), bucketName)()
      val rightProj = Project(right.output :+ rAlias, right)
      // Sequence is TimeZoneAwareExpression: the analyzer's ResolveTimeZone
      // normally fills timeZoneId, but this rule runs post-analysis, so an
      // unset zone leaves the expression (and the whole plan) unresolved
      val gen = Explode(Sequence(
        floorDiv(new Add(micros(lts), Literal(lo, LongType))),
        floorDiv(new Add(micros(lts), Literal(hi, LongType))),
        None, Some(conf.sessionLocalTimeZone)))
      val f = gen.elementSchema.head
      val bl = AttributeReference(s"${bucketName}_l", f.dataType, f.nullable)()
      val genNode = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bl), child = left)
      val newJoin = Join(genNode, rightProj, Inner,
        Some(And(cond, EqualTo(bl, rAlias.toAttribute))), hint)
      Project(j.output, newJoin)
    }
  }
}
