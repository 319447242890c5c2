package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet predicate pushdown for the TIMESTAMP(NANOS) rebuild.
  *
  * The driver's parquet carries three TIMESTAMP(NANOS) columns, which Spark
  * can only read as nanos-since-epoch longs
  * (`spark.sql.legacy.parquet.nanosAsLong=true`); `prepare()` rebuilds them
  * as microsecond timestamps with `timestamp_micros(c div 1000)`. Catalyst
  * pushes a time-range filter below that projection by substituting the
  * alias, but the resulting predicate compares an EXPRESSION over the scan
  * column, which the parquet source cannot translate — so a time-ranged
  * scan reads every row group no matter how selective the range is
  * (round-15 "not yet optimized" item; guide §6: PushedFilters must reach
  * the scan).
  *
  * This rule finds conjuncts of the shape
  * `timestamp_micros(c div 1000) <cmp> TIMESTAMP_LITERAL` and ANDs in the
  * IMPLIED plain-column bound on the raw nanos long `c`, which the parquet
  * source can push into row-group/page pruning. The original conjunct is
  * kept — the added bound is implied by it, so the filter's row set is
  * unchanged by construction (no rounding edge case can widen or narrow the
  * result; the redundant exact predicate still runs post-scan).
  *
  * Bound derivation (K = literal micros, `div` truncates toward zero, so
  * `|c - 1000*(c div 1000)| <= 999` for every sign):
  *  - `q >= K`  implies `c >= 1000K - 999`
  *  - `q >  K`  implies `c >= 1000K + 1`
  *  - `q <= K`  implies `c <= 1000K + 999`
  *  - `q <  K`  implies `c <= 1000K - 1`
  *  - `q == K`  implies both `>= 1000K - 999` and `<= 1000K + 999`
  * where `q = c div 1000`. Literals within 1000 of the long range edges are
  * skipped (the multiply would overflow — such timestamps are out of any
  * real data range anyway).
  */
object PushNanosTimestampFilters extends Rule[LogicalPlan] with PredicateHelper {

  private val NanosPerMicro = 1000L
  private val MaxSafeMicros = Long.MaxValue / NanosPerMicro - 1

  /** `timestamp_micros(c div 1000)` over a raw long scan column. */
  private object NanosRebuild {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => (d.left, d.right) match {
        case (a: Attribute, Literal(n: Long, LongType))
            if a.dataType == LongType && n == NanosPerMicro => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  /** A non-null timestamp literal as its micros-since-epoch long. */
  private object TsMicros {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if math.abs(v) <= MaxSafeMicros =>
        Some(v)
      case _ => None
    }
  }

  private def geq(a: Attribute, nanos: Long): Expression =
    GreaterThanOrEqual(a, Literal(nanos, LongType))
  private def leq(a: Attribute, nanos: Long): Expression =
    LessThanOrEqual(a, Literal(nanos, LongType))

  private def implied(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(NanosRebuild(a), TsMicros(k)) =>
      Seq(geq(a, k * NanosPerMicro - 999))
    case GreaterThan(NanosRebuild(a), TsMicros(k)) =>
      Seq(geq(a, k * NanosPerMicro + 1))
    case LessThanOrEqual(NanosRebuild(a), TsMicros(k)) =>
      Seq(leq(a, k * NanosPerMicro + 999))
    case LessThan(NanosRebuild(a), TsMicros(k)) =>
      Seq(leq(a, k * NanosPerMicro - 1))
    case EqualTo(NanosRebuild(a), TsMicros(k)) =>
      Seq(geq(a, k * NanosPerMicro - 999), leq(a, k * NanosPerMicro + 999))
    // literal-first spellings
    case GreaterThanOrEqual(TsMicros(k), NanosRebuild(a)) =>
      Seq(leq(a, k * NanosPerMicro + 999))
    case GreaterThan(TsMicros(k), NanosRebuild(a)) =>
      Seq(leq(a, k * NanosPerMicro - 1))
    case LessThanOrEqual(TsMicros(k), NanosRebuild(a)) =>
      Seq(geq(a, k * NanosPerMicro - 999))
    case LessThan(TsMicros(k), NanosRebuild(a)) =>
      Seq(geq(a, k * NanosPerMicro + 1))
    case EqualTo(TsMicros(k), NanosRebuild(a)) =>
      Seq(geq(a, k * NanosPerMicro - 999), leq(a, k * NanosPerMicro + 999))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // idempotent under the fixed-point batch: only add bounds not
      // already present (semantically) in the condition, once each
      val added = conjuncts.flatMap(implied)
        .foldLeft(Vector.empty[Expression]) { (acc, b) =>
          if ((conjuncts ++ acc).exists(_.semanticEquals(b))) acc else acc :+ b
        }
      if (added.isEmpty) f
      else Filter((conjuncts ++ added).reduce(And), child)
  }
}
