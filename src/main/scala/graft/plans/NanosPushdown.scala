package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring parquet row-group pruning for the events
  * table's nanos timestamps.
  *
  * graft.Tables reads events.ts as a raw nanos long (Spark cannot read
  * parquet TIMESTAMP(NANOS) natively) and rebuilds a TimestampType column
  * as `timestamp_micros(ts div 1000)`. Any predicate a query writes
  * against that column therefore wraps the scan attribute in an
  * expression, and FileSourceStrategy cannot translate it into a parquet
  * data filter — at 100 TB that is the difference between pruning
  * row groups by min/max stats and reading everything.
  *
  * This rule derives REDUNDANT raw-long conjuncts from such comparisons
  * (floor-division inverse, exact for positive epochs):
  *   us(ts) >= U  =>  ts >= U*1000          us(ts) > U  =>  ts > U*1000+999
  *   us(ts) <= U  =>  ts <= U*1000+999      us(ts) < U  =>  ts < U*1000
  * and ANDs them into the Filter. The original predicate stays — results
  * are unchanged; the added conjunct is what reaches PushedFilters.
  * OR conditions derive only if every branch derives. Fixed-point safe:
  * derived conjuncts never re-match, and semantically-present conjuncts
  * are not re-added.
  *
  * Registered per-session via spark.experimental.extraOptimizations
  * (runs after the main optimizer batches, so literals are folded and
  * filters already sit on the scan).
  */
object NanosPushdown extends Rule[LogicalPlan] {

  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq NanosPushdown))
      spark.experimental.extraOptimizations = cur :+ NanosPushdown
  }

  /** timestamp_micros(attr div 1000) over a long scan attribute. */
  private object Converted {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) =>
        (d.left, d.right) match {
          case (a: Attribute, Literal(1000L, LongType)) if a.dataType == LongType => Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  private object TsLit {
    // positive-epoch guard: IntegralDivide truncates toward zero, so the
    // floor-inverse bounds below would be off by one microsecond for
    // pre-1970 values
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) if us > 0L => Some(us)
      case _ => None
    }
  }

  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(Converted(a), TsLit(us)) => Some(GreaterThanOrEqual(a, Literal(us * 1000L)))
    case GreaterThan(Converted(a), TsLit(us))        => Some(GreaterThan(a, Literal(us * 1000L + 999L)))
    case LessThanOrEqual(Converted(a), TsLit(us))    => Some(LessThanOrEqual(a, Literal(us * 1000L + 999L)))
    case LessThan(Converted(a), TsLit(us))           => Some(LessThan(a, Literal(us * 1000L)))
    case EqualTo(Converted(a), TsLit(us)) =>
      Some(And(GreaterThanOrEqual(a, Literal(us * 1000L)), LessThanOrEqual(a, Literal(us * 1000L + 999L))))
    // literal-first forms normalize to the attribute-first equivalents
    case GreaterThanOrEqual(l @ TsLit(_), c @ Converted(_)) => derive(LessThanOrEqual(c, l))
    case GreaterThan(l @ TsLit(_), c @ Converted(_))        => derive(LessThan(c, l))
    case LessThanOrEqual(l @ TsLit(_), c @ Converted(_))    => derive(GreaterThanOrEqual(c, l))
    case LessThan(l @ TsLit(_), c @ Converted(_))           => derive(GreaterThan(c, l))
    case EqualTo(l @ TsLit(_), c @ Converted(_))            => derive(EqualTo(c, l))
    case And(l, r) =>
      (derive(l), derive(r)) match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (Some(a), None)    => Some(a)
        case (None, Some(b))    => Some(b)
        case _                  => None
      }
    case Or(l, r) => for { a <- derive(l); b <- derive(r) } yield Or(a, b)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      derive(cond) match {
        case Some(d) =>
          val have = conjuncts(cond)
          val fresh = conjuncts(d).filterNot(n => have.exists(_.semanticEquals(n)))
          if (fresh.isEmpty) f else Filter(fresh.foldLeft(cond)(And(_, _)), child)
        case None => f
      }
  }
}
