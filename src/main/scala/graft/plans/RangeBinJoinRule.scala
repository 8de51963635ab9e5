package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite a pure non-equi interval join into
  * the binned equi-join of [[BinnedRangeJoin]] — automatically, so a
  * user who writes the natural `a JOIN b ON pt >= lo AND pt <= hi`
  * gets a shuffled hash/sort-merge join instead of a cartesian product
  * or a broadcast nested loop.
  *
  * Opt-in via session conf (the bin width is domain knowledge only the
  * user has):
  *
  *   SET spark.graft.rangeJoin.binWidth = <positive double>
  *
  * Optionally scope it (round-3 advice — the conf is session-global,
  * so an unrelated query's sentinel row could otherwise trip the loud
  * span error) with a comma-separated allowlist of table/path
  * substrings; the rewrite then fires only for joins over matching
  * leaf relations, and every fire logs a warning naming the opt-out:
  *
  *   SET spark.graft.rangeJoin.onlyTables = events,intervals_gold
  *
  * Wiring: injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`), or at runtime via
  * `spark.experimental.extraOptimizations`. The rule is a no-op while
  * the conf is unset, so it is always safe to install.
  *
  * Match shape: an INNER join whose condition, split into conjuncts,
  * contains a lower bound (`pt >= lo` / `pt > lo`) and an upper bound
  * (`pt <= hi` / `pt < hi`) on the same point expression, where the
  * point references exactly one side and both bounds reference only
  * the other side — and NO cross-side equi conjunct exists (if one
  * does, Spark already plans a hash join on it, and the guard also
  * makes the rewrite a fixpoint: the rewritten join carries a bin
  * equi conjunct). The original condition is kept as a residual, so
  * the rewrite can never add or lose a qualifying pair — see the
  * correctness argument on [[BinnedRangeJoin]]. The only rows
  * pre-filtered from the interval side are those that provably match
  * nothing (`lo > hi` under Spark's total order, or a null bound —
  * the range predicate is then null); anything else that cannot be
  * binned — an infinite or NaN bound, or a span wider than
  * `spark.graft.rangeJoin.maxBinsPerInterval` bins (default 2^20) —
  * raises an actionable error instead of materializing an
  * executor-OOM-sized array or silently dropping matchable rows:
  * lossless-or-loud. (The library combinator additionally routes
  * such rows through an exact plain-join fallback; a rule cannot
  * build that self-union safely.)
  */
class RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"
  val OnlyTablesKey = "spark.graft.rangeJoin.onlyTables"

  // a malformed conf value must disable the rewrite, not throw inside
  // the optimizer and take every query in the session down with it
  private def binWidth: Option[Double] =
    Option(conf.getConfString(ConfKey, ""))
      .filter(_.nonEmpty).flatMap(_.toDoubleOption)
      .filter(w => w > 0 && !w.isNaN && !w.isInfinite)

  private def maxBins: Double =
    Option(conf.getConfString(MaxBinsKey, ""))
      .filter(_.nonEmpty).flatMap(_.toDoubleOption)
      .filter(v => v >= 1 && !v.isNaN && !v.isInfinite)
      .getOrElse((1 << 20).toDouble)

  /** Blast-radius limiter (round-3 advice): binWidth alone applies
    * session-globally, so one sentinel row in an UNRELATED query's
    * interval table could raise the loud span error. When this
    * comma-separated list of case-insensitive substrings is set, the
    * rewrite fires only for joins whose leaf relations (catalog
    * identifier or file path) match one of them — scoping the conf to
    * the tables the bin width was actually chosen for.
    */
  private def onlyTables: Seq[String] =
    Option(conf.getConfString(OnlyTablesKey, ""))
      .map(_.split(",").iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def leafNames(p: LogicalPlan): Seq[String] = p.collectLeaves().flatMap {
    case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      r.catalogTable.map(_.identifier.unquotedString).toSeq ++ (r.relation match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location.rootPaths.map(_.toString)
        case _ => Nil
      })
    case v: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      Seq(v.table.name())
    case other => Seq(other.nodeName)
  }

  private def inScope(j: Join): Boolean = onlyTables match {
    case Nil => true
    case pats =>
      val names = leafNames(j).map(_.toLowerCase(java.util.Locale.ROOT))
      pats.exists(p => names.exists(_.contains(p)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUpWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.JOIN)) {
        case j @ Join(_, _, Inner, Some(cond), _) if eligible(j, cond) && inScope(j) =>
          rewrite(j, cond, w) match {
            case Some(rewritten) =>
              // session-global conf, per-query effect: leave an audit
              // trail so a surprising plan (or the loud span error) is
              // traceable to this rewrite and its opt-out
              logWarning(s"graft range-bin rewrite fired ($ConfKey=$w) on join " +
                s"condition `${cond.sql}`; scope it with $OnlyTablesKey or unset " +
                s"$ConfKey to opt out")
              rewritten
            case None => j
          }
      }
  }

  private def oneSided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType.isInstanceOf[NumericType]

  /** No cross-side equi conjunct (also the fixpoint guard). */
  private def eligible(j: Join, cond: Expression): Boolean =
    !splitConjunctivePredicates(cond).exists {
      case Equality(a, b) =>
        (oneSidedAny(a, j.left) && oneSidedAny(b, j.right)) ||
          (oneSidedAny(a, j.right) && oneSidedAny(b, j.left))
      case _ => false
    }

  private def oneSidedAny(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def rewrite(j: Join, cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    // normalize every inequality conjunct into (pt, bound, isLower)
    def bounds(ptSide: LogicalPlan, ivSide: LogicalPlan)
        : (Seq[(Expression, Expression)], Seq[(Expression, Expression)]) = {
      val lowers = Seq.newBuilder[(Expression, Expression)]
      val uppers = Seq.newBuilder[(Expression, Expression)]
      conjuncts.foreach {
        case GreaterThanOrEqual(a, b) =>
          if (oneSided(a, ptSide) && oneSided(b, ivSide)) lowers += ((a, b))
          else if (oneSided(b, ptSide) && oneSided(a, ivSide)) uppers += ((b, a))
        case GreaterThan(a, b) =>
          if (oneSided(a, ptSide) && oneSided(b, ivSide)) lowers += ((a, b))
          else if (oneSided(b, ptSide) && oneSided(a, ivSide)) uppers += ((b, a))
        case LessThanOrEqual(a, b) =>
          if (oneSided(a, ptSide) && oneSided(b, ivSide)) uppers += ((a, b))
          else if (oneSided(b, ptSide) && oneSided(a, ivSide)) lowers += ((b, a))
        case LessThan(a, b) =>
          if (oneSided(a, ptSide) && oneSided(b, ivSide)) uppers += ((a, b))
          else if (oneSided(b, ptSide) && oneSided(a, ivSide)) lowers += ((b, a))
        case _ => ()
      }
      (lowers.result(), uppers.result())
    }

    def firstPair(ptSide: LogicalPlan, ivSide: LogicalPlan)
        : Option[(Expression, Expression, Expression)] = {
      val (lowers, uppers) = bounds(ptSide, ivSide)
      (for {
        (pt, lo) <- lowers.view
        (pt2, hi) <- uppers.view
        if pt.semanticEquals(pt2)
      } yield (pt, lo, hi)).headOption
    }

    firstPair(j.left, j.right)
      .map { case (pt, lo, hi) => build(j, cond, w, pt, lo, hi, ptOnLeft = true) }
      .orElse(firstPair(j.right, j.left)
        .map { case (pt, lo, hi) => build(j, cond, w, pt, lo, hi, ptOnLeft = false) })
  }

  private def build(j: Join, cond: Expression, w: Double,
                    pt: Expression, lo: Expression, hi: Expression,
                    ptOnLeft: Boolean): LogicalPlan = {
    val wLit = Literal(w, DoubleType)
    // total function (NaN -> 0, infinities saturate): safe because the
    // original condition stays as a residual — see BinnedRangeJoin
    def binOf(e: Expression): Expression =
      Floor(Divide(Cast(e, DoubleType), wLit))
    def dbl(e: Expression): Expression = Cast(e, DoubleType)

    val (ptSide, ivSide) = if (ptOnLeft) (j.left, j.right) else (j.right, j.left)

    val binPt = Alias(binOf(pt), "__graft_bin_pt")()
    val newPtSide = Project(ptSide.output :+ binPt, ptSide)

    // `lo <= hi` is the ONLY safe pre-filter: an empty interval can
    // match no point under any comparison semantics (even NaN/∞ ones),
    // and Sequence would reject the descending bounds at runtime.
    // Non-finite bounds deliberately PASS this filter (±∞ sorts
    // normally, NaN sorts greatest, so e.g. lo = -∞ or hi = NaN rows
    // survive) and then fail the span guard below — an infinite or
    // NaN span is never <= maxBins — so rows the original join could
    // match are never silently dropped.
    val ivFiltered = Filter(LessThanOrEqual(dbl(lo), dbl(hi)), ivSide)
    val binIv = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
    // a single over-wide interval (e.g. an open-end sentinel like
    // hi = 1e9 with binWidth = 10) would explode into a huge per-row
    // array and OOM an executor; fail LOUDLY with the remedy instead.
    // (The library combinator routes such rows through an exact
    // plain-join fallback branch; a self-union needs fresh exprIds
    // everywhere, which an optimizer rule cannot do safely — so the
    // rule's contract is lossless-or-error, never silent drops.)
    val spanOk = LessThanOrEqual(
      Divide(Subtract(dbl(hi), dbl(lo)), wLit), Literal(maxBins, DoubleType))
    val guardedHi = If(spanOk, binOf(hi),
      Cast(new RaiseError(Literal(
        s"graft range-bin rewrite: an interval spans more than $MaxBinsKey " +
          s"(${maxBins.toLong}) bins at $ConfKey = $w; raise the bin width " +
          "or the cap, or unset the conf for this query")), LongType))
    // Sequence is TimeZoneAwareExpression: it resolves only with a
    // concrete zone, even for integral sequences
    val seq = Sequence(binOf(lo), guardedHi, Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val newIvSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binIv),
      child = ivFiltered)

    val newCond = And(EqualTo(binPt.toAttribute, binIv), cond)
    val newJoin =
      if (ptOnLeft) Join(newPtSide, newIvSide, Inner, Some(newCond), j.hint)
      else Join(newIvSide, newPtSide, Inner, Some(newCond), j.hint)
    // restore the original output (same attribute ids, bins dropped)
    Project(j.output, newJoin)
  }
}
