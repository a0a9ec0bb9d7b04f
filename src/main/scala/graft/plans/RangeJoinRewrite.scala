package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a naive point-in-interval theta join —
  * `points JOIN intervals ON k >= lo AND k < hi` — into the bucketed
  * equi-join [[graft.operators.RangeJoin]] spells by hand.
  *
  * Spark plans the naive form as BroadcastNestedLoopJoin: O(|points| ×
  * |intervals|) comparisons, the classic accidental scale-killer (a user
  * writes the obviously-correct condition and it works at test scale,
  * then burns a cluster at 100 TB). The rewrite is the same one RangeJoin
  * documents: intervals replicate to the key-axis buckets they span
  * (bounded `explode(sequence(...))`), points map to their single bucket,
  * and the join becomes an equi-join on the bucket id with the original
  * containment predicate kept as a residual filter — so join SELECTION
  * (hash vs sort-merge, AQE, skew handling) applies again.
  *
  * This is the `SparkSessionExtensions` integration rung of the custom-
  * operator ladder (SURVEY §4): a `Rule[LogicalPlan]` injected by
  * [[graft.GraftExtensions]], so SQL-only users get the bucketed plan
  * without knowing the operator exists. Fires on any two-conjunct
  * lower+upper bound over an integral key — all four comparison
  * operators, open or closed intervals, either operand order, either
  * conjunct order — with each side's references cleanly split across the
  * two inputs; everything else is left to Spark. The rewritten join
  * carries an equality conjunct, so the rule cannot re-fire on its own
  * output.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** Key-axis slice per bucket — see RangeJoin's trade-off note
    * (replication factor = interval width / bucket width). Configurable
    * because the right width depends on the key domain: 256 suits
    * row-id-like keys; millisecond-epoch keys with day-wide intervals
    * want ~an hour. Set `spark.graft.rangejoin.bucketWidth` accordingly,
    * or `spark.graft.rangejoin.enabled=false` to leave theta joins to
    * Spark's own planner. */
  val DefaultBucketWidth = 256L
  val WidthKey = "spark.graft.rangejoin.bucketWidth"
  val EnabledKey = "spark.graft.rangejoin.enabled"

  private def bucketWidth: Long =
    conf.getConfString(WidthKey, DefaultBucketWidth.toString).toLong
  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** floor(e / width) as LONG — identical arithmetic to RangeJoin's
    * DataFrame spelling, so the two paths bucket identically. */
  private def bucketOf(e: Expression, width: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width.toDouble))), LongType)

  /** One reading of a comparison: `key` is bounded by `bound` from below
    * (`isLower`) or above, inclusively or not. Every comparison has TWO
    * readings (either operand could be the point key); the match below
    * keeps whichever one pairs up with the other conjunct. */
  private case class Reading(key: Expression, bound: Expression,
      isLower: Boolean, inclusive: Boolean)

  private def readings(e: Expression): Seq[Reading] = e match {
    case LessThan(a, b) =>
      Seq(Reading(a, b, isLower = false, inclusive = false),
        Reading(b, a, isLower = true, inclusive = false))
    case LessThanOrEqual(a, b) =>
      Seq(Reading(a, b, isLower = false, inclusive = true),
        Reading(b, a, isLower = true, inclusive = true))
    case GreaterThan(a, b) =>
      Seq(Reading(a, b, isLower = true, inclusive = false),
        Reading(b, a, isLower = false, inclusive = false))
    case GreaterThanOrEqual(a, b) =>
      Seq(Reading(a, b, isLower = true, inclusive = true),
        Reading(b, a, isLower = false, inclusive = true))
    case _ => Seq.empty
  }

  private def wellTyped(r: Reading): Boolean =
    integral(r.key) && integral(r.bound) &&
      r.key.deterministic && r.bound.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case j @ Join(left, right, Inner, Some(cond @ And(c1, c2)), hint) =>
      // All four comparison spellings and both conjunct orders: find a
      // (lower, upper) pair of readings that agree on the key expression
      // and split references cleanly across the two join inputs.
      val pairs = for {
        r1 <- readings(c1); r2 <- readings(c2)
        if r1.isLower != r2.isLower
        if r1.key.semanticEquals(r2.key)
        if wellTyped(r1) && wellTyped(r2)
      } yield if (r1.isLower) (r1, r2) else (r2, r1)
      val fired = pairs.collectFirst {
        case (lo, hi)
            if lo.key.references.subsetOf(left.outputSet) &&
              (lo.bound.references ++ hi.bound.references).subsetOf(right.outputSet) =>
          rewrite(j, points = left, intervals = right, lo, hi, cond,
            pointsAreLeft = true, hint)
        case (lo, hi)
            if lo.key.references.subsetOf(right.outputSet) &&
              (lo.bound.references ++ hi.bound.references).subsetOf(left.outputSet) =>
          rewrite(j, points = right, intervals = left, lo, hi, cond,
            pointsAreLeft = false, hint)
      }
      fired.getOrElse(j)
  }

  /** `cast(e as long) + delta` (delta 0 elides the Add). */
  private def adjusted(e: Expression, delta: Long): Expression = {
    val c = Cast(e, LongType)
    if (delta == 0) c else Add(c, Literal(delta))
  }

  private def rewrite(j: Join, points: LogicalPlan, intervals: LogicalPlan,
      lo: Reading, hi: Reading, residual: Expression,
      pointsAreLeft: Boolean, hint: JoinHint): LogicalPlan = {
    val width = bucketWidth
    // Points: one bucket per row.
    val pAlias = Alias(bucketOf(lo.key, width), "__graft_pb")()
    val pProj = Project(points.output :+ pAlias, points)

    // Tighten both bounds to the INCLUSIVE integer interval [L', U']:
    // an exclusive bound moves one integer inward. All downstream
    // arithmetic (emptiness, bucket span) is then inclusivity-free.
    val loAdj = adjusted(lo.bound, if (lo.inclusive) 0 else 1)
    val hiAdj = adjusted(hi.bound, if (hi.inclusive) 0 else -1)

    // Intervals: drop empty ones FIRST — Spark's Sequence THROWS on
    // start > stop with a positive step (unlike generate_series engines),
    // so a degenerate empty-interval row straddling a bucket boundary
    // would crash the rewritten query while the naive plan merely matched
    // nothing. Then replicate to [floor(L'/w), floor(U'/w)].
    // Sequence is TimeZoneAwareExpression: a post-analysis rule must set
    // the zone itself or the plan flips back to unresolved.
    //
    // Domain-extreme guard: the ±1 tightening uses the session's default
    // (non-ANSI, wrapping) Add, so an exclusive bound AT Long.MaxValue/
    // MinValue would wrap and make the emptiness filter and Sequence
    // bounds diverge from the naive plan. Such intervals are provably
    // empty over long keys (`k > Long.MaxValue` / `k < Long.MinValue`
    // match nothing), so the guard drops those rows before the adjusted
    // arithmetic ever evaluates — bit-identical to the naive join.
    val wrapGuards = Seq(
      if (lo.inclusive) None
      else Some(LessThan(Cast(lo.bound, LongType), Literal(Long.MaxValue))),
      if (hi.inclusive) None
      else Some(GreaterThan(Cast(hi.bound, LongType), Literal(Long.MinValue)))
    ).flatten
    val nonEmpty = Filter(
      (wrapGuards :+ GreaterThanOrEqual(hiAdj, loAdj)).reduceLeft(And), intervals)
    val seq = Sequence(
      bucketOf(loAdj, width),
      bucketOf(hiAdj, width),
      Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val iAttr = AttributeReference("__graft_ib", LongType, nullable = false)()
    val iGen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(iAttr), child = nonEmpty)

    val equi = EqualTo(pAlias.toAttribute, iAttr)
    val joined =
      if (pointsAreLeft) Join(pProj, iGen, Inner, Some(And(equi, residual)), hint)
      else Join(iGen, pProj, Inner, Some(And(equi, residual)), hint)
    // Restore the original schema (drop the bucket columns).
    Project(j.output, joined)
  }
}
