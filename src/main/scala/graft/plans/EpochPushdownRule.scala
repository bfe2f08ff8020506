package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: transpose time predicates written against a *derived*
  * epoch-integer column back onto the raw parquet timestamp column, so
  * parquet row-group / page pruning (min-max statistics) fires.
  *
  * Motivation ([[graft.Tables.events]]): the driver's `events.ts` arrives
  * either as int64 epoch-nanos or as parquet timestamp[us]; the loader
  * normalizes the latter to nanos via
  * `unix_micros(cast(ts as timestamp)) * 1000L`, and every downstream
  * time window is an integer comparison on that derived value (often
  * further `div`-scaled: nanos→micros, nanos→seconds, seconds→hours).
  * Without this rule the parquet scan sees a filter on an *expression* of
  * `ts` — nothing pushes down, so a time-sliced query reads every row
  * group: at 100 TB that turns a one-hour slice into a full-table scan.
  * The reference's PostgreSQL layout never has this problem — `WHERE ts <
  * $1` on a native timestamp column is trivially index/BRIN-prunable
  * (yoshioterada pgvector app, Function.java event-time handling) — so
  * matching it on Spark requires the scan predicate to live on the
  * native column.
  *
  * Mechanics: for each Filter conjunct `chain(ts) cmp literal`, where
  * `chain` is a tower of monotone integer steps —
  *   `* c` (positive literal), `div c` (positive literal, Spark's
  *   truncating IntegralDivide), `+ c`, `- c`
  * — rooted at `unix_micros(ts)` / `unix_micros(cast(tsNTZ as
  * timestamp))` / `unix_millis` / `unix_seconds`, the comparison is
  * inverted step by step into a micros interval, conservatively widened
  * at each inexact step (floor/trunc division inverts to a bound that is
  * implied by, not equivalent to, the original), and planted as an ADDED
  * conjunct `ts >= lit` / `ts <= lit` on the raw column. The original
  * predicate stays — the planted guard is implied by it, so the rewrite
  * is strictly semantics-preserving even where the widening is loose —
  * and the new conjunct, referencing a bare attribute, is exactly what
  * `DataSourceStrategy` selects for parquet pushdown.
  *
  * Soundness notes:
  *  - `div` is Spark's truncate-toward-zero IntegralDivide, not floor;
  *    the inversion uses bounds valid for BOTH floor and truncation
  *    (`trunc(x/c) ∈ [floor(x/c), ceil(x/c)]`), so negative epochs
  *    (pre-1970) stay correct, merely a step looser.
  *  - All bound arithmetic is overflow-checked (`Math.*Exact`); a step
  *    that would overflow simply drops that side of the interval.
  *  - FORWARD-chain overflow: a wrap-range instant (year-9999 sentinel
  *    through `* 1000`) wraps under non-ANSI semantics, where a wrapped
  *    value can satisfy the original predicate while its mathematical
  *    value does not — the rule therefore stands down when ANSI is off;
  *    under ANSI (the Spark 4 + graft default) such a row ERRORS in the
  *    unrewritten plan, and pruning it first is ordinary
  *    error-avoidance, the same as filter pushdown.
  *  - The NTZ→LTZ cast inside the chain maps wall-clock to instant via
  *    the session zone; the rule only fires when that zone is UTC (the
  *    graft session default), where the mapping is the identity on the
  *    internal micros value — under a DST-bearing zone the cast is still
  *    monotone but not literal-invertible, so the rule stands down.
  *  - Idempotent across optimizer batches: a guard already present among
  *    the conjuncts (semanticEquals) is not planted again.
  */
object EpochPushdownRule extends Rule[LogicalPlan] {

  /** Closed integer interval [lo, hi] on the value of a chain node;
    * None = unbounded on that side. */
  private case class Bounds(lo: Option[Long], hi: Option[Long]) {
    def isEmpty: Boolean = lo.isEmpty && hi.isEmpty
  }

  private def exact(f: => Long): Option[Long] =
    try Some(f) catch { case _: ArithmeticException => None }

  /** ceil(a / c) for c > 0, overflow-safe. */
  private def ceilDiv(a: Long, c: Long): Long = {
    val q = a / c
    if (a % c != 0 && a > 0) q + 1 else q
  }
  /** floor(a / c) for c > 0. */
  private def floorDiv(a: Long, c: Long): Long = Math.floorDiv(a, c)

  /** Positive long literal (int or long). */
  private object PosConst {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) if v > 0 => Some(v)
      case Literal(v: Int, _) if v > 0 => Some(v.toLong)
      case _ => None
    }
  }
  private object AnyConst {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case _ => None
    }
  }

  /** The chain root: an epoch extraction over the raw timestamp column.
    * Returns (attribute, unit scale in micros-per-unit). `unix_micros`
    * → 1, `unix_millis` → 1000, `unix_seconds` → 1000000. The cast form
    * covers TIMESTAMP_NTZ parquet columns read under a UTC session. */
  private def root(e: Expression): Option[(Attribute, Long)] = {
    def attrOf(c: Expression): Option[Attribute] = c match {
      case a: Attribute if a.dataType == TimestampType => Some(a)
      case Cast(a: Attribute, TimestampType, _, _)
          if a.dataType == TimestampNTZType => Some(a)
      case _ => None
    }
    e match {
      case UnixMicros(c) => attrOf(c).map(_ -> 1L)
      case UnixMillis(c) => attrOf(c).map(_ -> 1000L)
      case UnixSeconds(c) => attrOf(c).map(_ -> 1000000L)
      case _ => None
    }
  }

  /** Push an interval on `e`'s value down to an interval on the root's
    * micros value; returns the raw attribute and its micros bounds. */
  private def invert(e: Expression, b: Bounds): Option[(Attribute, Bounds)] = e match {
    case _ if b.isEmpty => None
    case Multiply(x, PosConst(c), _) =>
      invert(x, Bounds(b.lo.map(ceilDiv(_, c)), b.hi.map(floorDiv(_, c))))
    case Multiply(PosConst(c), x, _) =>
      invert(x, Bounds(b.lo.map(ceilDiv(_, c)), b.hi.map(floorDiv(_, c))))
    case IntegralDivide(x, PosConst(c), _) =>
      // trunc(x/c) >= L ⇒ x > (L-1)*c ; trunc(x/c) <= H ⇒ x < (H+1)*c
      invert(x, Bounds(
        b.lo.flatMap(l => exact(Math.addExact(Math.multiplyExact(Math.subtractExact(l, 1L), c), 1L))),
        b.hi.flatMap(h => exact(Math.subtractExact(Math.multiplyExact(Math.addExact(h, 1L), c), 1L)))))
    case Add(x, AnyConst(c), _) =>
      invert(x, Bounds(b.lo.flatMap(l => exact(Math.subtractExact(l, c))),
        b.hi.flatMap(h => exact(Math.subtractExact(h, c)))))
    case Add(AnyConst(c), x, _) =>
      invert(x, Bounds(b.lo.flatMap(l => exact(Math.subtractExact(l, c))),
        b.hi.flatMap(h => exact(Math.subtractExact(h, c)))))
    case Subtract(x, AnyConst(c), _) =>
      invert(x, Bounds(b.lo.flatMap(l => exact(Math.addExact(l, c))),
        b.hi.flatMap(h => exact(Math.addExact(h, c)))))
    case other =>
      root(other).map { case (attr, unit) =>
        // value = micros div unit (exact integer division for unix_millis
        // /unix_seconds on in-range instants; unit=1 is the identity)
        attr -> Bounds(
          b.lo.flatMap(l => exact(Math.multiplyExact(l, unit))),
          b.hi.flatMap(h => exact {
            val x = Math.multiplyExact(h, unit)
            if (unit == 1L) x else Math.addExact(x, unit - 1L)
          }))
      }
  }

  /** Normalize `chain cmp lit` / `lit cmp chain` into chain-value bounds. */
  private def boundsOf(p: Expression): Option[(Expression, Bounds)] = p match {
    case LessThan(x, AnyConst(v)) => Some((x, Bounds(None, exact(Math.subtractExact(v, 1L)))))
    case LessThanOrEqual(x, AnyConst(v)) => Some((x, Bounds(None, Some(v))))
    case GreaterThan(x, AnyConst(v)) => Some((x, Bounds(exact(Math.addExact(v, 1L)), None)))
    case GreaterThanOrEqual(x, AnyConst(v)) => Some((x, Bounds(Some(v), None)))
    case EqualTo(x, AnyConst(v)) => Some((x, Bounds(Some(v), Some(v))))
    case LessThan(AnyConst(v), x) => Some((x, Bounds(exact(Math.addExact(v, 1L)), None)))
    case LessThanOrEqual(AnyConst(v), x) => Some((x, Bounds(Some(v), None)))
    case GreaterThan(AnyConst(v), x) => Some((x, Bounds(None, exact(Math.subtractExact(v, 1L)))))
    case GreaterThanOrEqual(AnyConst(v), x) => Some((x, Bounds(None, Some(v))))
    case EqualTo(AnyConst(v), x) => Some((x, Bounds(Some(v), Some(v))))
    case _ => None
  }

  private def tsLiteral(micros: Long, dt: org.apache.spark.sql.types.DataType): Literal =
    Literal(micros, dt)

  /** Implied raw-column guards for one conjunct, or Nil. */
  private def guardsFor(p: Expression): Seq[Expression] = {
    // cheap reject: only predicates whose tree contains an epoch
    // extraction can possibly invert
    if (!p.exists {
      case _: UnixMicros | _: UnixMillis | _: UnixSeconds => true
      case _ => false
    }) return Nil
    boundsOf(p).toSeq.flatMap { case (chain, b) =>
      invert(chain, b).toSeq.flatMap { case (attr, mb) =>
        mb.lo.map(l => GreaterThanOrEqual(attr, tsLiteral(l, attr.dataType)).asInstanceOf[Expression]).toSeq ++
          mb.hi.map(h => LessThanOrEqual(attr, tsLiteral(h, attr.dataType)).asInstanceOf[Expression]).toSeq
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // NTZ→LTZ cast inversion is only literal under UTC (see scaladoc)
    if (conf.sessionLocalTimeZone != "UTC") return plan
    // Soundness gate: the inversion assumes the FORWARD chain evaluates
    // mathematically. Under non-ANSI semantics a `* c` step WRAPS for
    // wrap-range instants (e.g. a year-9999 SCD2 sentinel through
    // `unix_micros(ts) * 1000`), so a wrapped value can satisfy the
    // original predicate while the mathematical value does not — and the
    // planted guard would prune a row the original plan keeps. Under
    // ANSI (Spark 4's and graft's default) overflow is an ERROR in the
    // original plan, and an optimization that avoids an error by pruning
    // first is standard Catalyst behavior (filter pushdown does the same)
    // — so the rule runs only there.
    if (!conf.ansiEnabled) return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val conjuncts = splitConjuncts(cond)
        val guards = conjuncts.flatMap(guardsFor)
          .filter(_.references.subsetOf(child.outputSet))
          .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
          // two conjuncts can imply the same guard; plant it once
          .foldLeft(Vector.empty[Expression]) { (acc, g) =>
            if (acc.exists(_.semanticEquals(g))) acc else acc :+ g
          }
        if (guards.isEmpty) f
        else Filter(guards.foldLeft(cond)(And(_, _)), child)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
