package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Custom optimizer rule: rewrite comparisons of
  * `timestamp_micros(a div K)` against timestamp literals into plain
  * integer comparisons on `a`.
  *
  * Why it exists: the driver's events table originally stored INT64
  * TIMESTAMP(NANOS), which we read as a long and rebuild with
  * `timestamp_micros(ts div 1000)` ([[graft.queries.Tables]]). (The
  * round-10 regeneration switched the file to µs TIMESTAMP, which
  * surfaces as a plain `TimestampType` scan — predicates push natively
  * there and this rule simply never matches; it remains for any
  * nanos-encoded input.) A time-range predicate written
  * against the rebuilt column stops at that expression — Catalyst has no
  * rule to invert `timestamp_micros`, so nothing reaches the parquet scan
  * and a 100 TB time-range query degrades to a full scan. After this
  * rewrite the predicate is a bare attribute comparison and
  * FileSourceStrategy pushes it into PushedFilters → row-group pruning on
  * the time axis, which is the entire point of the MergeTree
  * `ORDER BY timestamp` analogue (reference parse.py:53).
  *
  * Inversion under Spark's `div` (truncation toward ZERO, k > 0) — exact
  * for every long `a`, including negatives (pre-1970 nanos):
  *   trunc(a/k) >= M  ⇔  a >= B(M)  where  B(M) = M*k        if M > 0
  *                                               = (M-1)*k+1  if M <= 0
  * (for M <= 0 the truncated quotient rounds up on negative a, so the
  * boundary shifts by k-1). The other comparisons derive from it:
  *   trunc(a/k) >  M  ⇔  a >= B(M+1)      trunc(a/k) <  M  ⇔  a < B(M)
  *   trunc(a/k) <= M  ⇔  a <  B(M+1)
  */
object PushTimestampMicrosPredicates extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(a div K) → (a, K). */
  private object TsOfDiv {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case MicrosToTimestamp(IntegralDivide(a, Literal(k: Long, LongType), _)) if k > 0 =>
        Some((a, k))
      case _ => None
    }
  }

  /** TimestampType literal → its epoch-micros internal value. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case _ => None
    }
  }

  private def exact(f: => Long): Option[Long] =
    try Some(f) catch { case _: ArithmeticException => None }

  /** B(M) of the scaladoc: the exact lower bound on `a` equivalent to
    * `trunc(a/k) >= M`. None on overflow → leave the predicate alone. */
  private def lowerBound(m: Long, k: Long): Option[Long] =
    if (m > 0) exact(Math.multiplyExact(m, k))
    else exact(Math.addExact(Math.multiplyExact(Math.subtractExact(m, 1L), k), 1L))

  private def lowerBoundSucc(m: Long, k: Long): Option[Long] =
    exact(Math.addExact(m, 1L)).flatMap(lowerBound(_, k))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ GreaterThanOrEqual(TsOfDiv(a, k), TsLit(m)) =>
      lowerBound(m, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).getOrElse(e)
    case e @ GreaterThan(TsOfDiv(a, k), TsLit(m)) =>
      lowerBoundSucc(m, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).getOrElse(e)
    case e @ LessThan(TsOfDiv(a, k), TsLit(m)) =>
      lowerBound(m, k).map(v => LessThan(a, Literal(v, LongType))).getOrElse(e)
    case e @ LessThanOrEqual(TsOfDiv(a, k), TsLit(m)) =>
      lowerBoundSucc(m, k).map(v => LessThan(a, Literal(v, LongType))).getOrElse(e)
    // mirrored literal-on-left forms
    case e @ GreaterThanOrEqual(TsLit(m), TsOfDiv(a, k)) =>   // lit >= div ⇔ div <= lit
      lowerBoundSucc(m, k).map(v => LessThan(a, Literal(v, LongType))).getOrElse(e)
    case e @ GreaterThan(TsLit(m), TsOfDiv(a, k)) =>
      lowerBound(m, k).map(v => LessThan(a, Literal(v, LongType))).getOrElse(e)
    case e @ LessThan(TsLit(m), TsOfDiv(a, k)) =>
      lowerBoundSucc(m, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).getOrElse(e)
    case e @ LessThanOrEqual(TsLit(m), TsOfDiv(a, k)) =>
      lowerBound(m, k).map(v => GreaterThanOrEqual(a, Literal(v, LongType))).getOrElse(e)
  }

  /** Idempotently attach to a session's extra optimizer batch. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}

/** `spark.sql.extensions`-style registration for cluster deployments:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PushTimestampMicrosPredicates)
  }
}
