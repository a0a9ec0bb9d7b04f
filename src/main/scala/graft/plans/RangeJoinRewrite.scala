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
  * without knowing the operator exists. Fires only on the exact
  * `GreaterThanOrEqual`/`LessThan` conjunction over integral keys with
  * each side's references cleanly split across the two inputs; everything
  * else is left to Spark. The rewritten join carries an equality
  * conjunct, so the rule cannot re-fire on its own output.
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

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transform {
    case j @ Join(left, right, Inner, Some(
        And(GreaterThanOrEqual(k1, lo), LessThan(k2, hi))), hint)
        if k1.semanticEquals(k2) && integral(k1) && integral(lo) && integral(hi)
          && k1.deterministic && lo.deterministic && hi.deterministic =>
      val cond = And(GreaterThanOrEqual(k1, lo), LessThan(k2, hi))
      if (k1.references.subsetOf(left.outputSet) &&
          (lo.references ++ hi.references).subsetOf(right.outputSet))
        rewrite(j, points = left, intervals = right, k1, lo, hi, cond,
          pointsAreLeft = true, hint)
      else if (k1.references.subsetOf(right.outputSet) &&
          (lo.references ++ hi.references).subsetOf(left.outputSet))
        rewrite(j, points = right, intervals = left, k1, lo, hi, cond,
          pointsAreLeft = false, hint)
      else j
  }

  private def rewrite(j: Join, points: LogicalPlan, intervals: LogicalPlan,
      k: Expression, lo: Expression, hi: Expression, residual: Expression,
      pointsAreLeft: Boolean, hint: JoinHint): LogicalPlan = {
    val width = bucketWidth
    // Points: one bucket per row.
    val pAlias = Alias(bucketOf(k, width), "__graft_pb")()
    val pProj = Project(points.output :+ pAlias, points)

    // Intervals: drop empty ones FIRST — Spark's Sequence THROWS on
    // start > stop with a positive step (unlike generate_series engines),
    // so a degenerate `hi <= lo` row straddling a bucket boundary would
    // crash the rewritten query while the naive plan merely matched
    // nothing. Then replicate to [floor(lo/w), floor((hi-1)/w)].
    // Sequence is TimeZoneAwareExpression: a post-analysis rule must set
    // the zone itself or the plan flips back to unresolved.
    val nonEmpty = Filter(GreaterThan(hi, lo), intervals)
    val seq = Sequence(
      bucketOf(lo, width),
      bucketOf(Subtract(Cast(hi, LongType), Literal(1L)), width),
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
