package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

import graft.operators.Events

/** Streaming per-key EWMA — the live counterpart of
  * [[graft.operators.Events.ewmaSmooth]], as CUSTOM state
  * (`flatMapGroupsWithState`): the state store carries one (lastUs,
  * lastEwma) pair per key — 16 bytes forever, however long the stream —
  * and every incoming point emits its smoothed value and pre-update
  * residual immediately (spike alerts can't wait for a window close).
  *
  * Exactly the batch operator's integer recursion
  * (`e_t = (α·v + (1e6−α)·e) div 1e6`, toward-zero division, points
  * ordered by (us, v_e6) within each micro-batch): one AvailableNow
  * drain emits row-for-row what `ewmaSmooth` computes (the q_stream_ewma
  * oracle replays the same recursive CTE), and drains separated by a
  * checkpoint restart continue the recursion from the carried state —
  * for in-event-time-order arrivals the union still equals the batch
  * fold (spec-pinned). Out-of-order arrivals ACROSS batches fold in
  * arrival order (the state has already advanced) — the honest streaming
  * trade; feed event-time-ordered landings when bit-parity with the
  * batch op matters. Pass `outOfOrder` (a registered
  * [[org.apache.spark.util.LongAccumulator]]) to SEE that trade
  * happening: it counts every point whose event time precedes the
  * state's last folded event time, i.e. exactly the points where batch
  * parity degraded — alert on it instead of trusting the landing
  * discipline blindly.
  *
  * Domain: |v_e6| must stay within ±[[graft.operators.Events.EwmaMaxAbsVE6]]
  * (~9.22e6 natural units) — the same bound the batch operator enforces;
  * out-of-domain points fail the batch task rather than silently wrap
  * (batch and streaming would wrap identically, so nothing downstream
  * could catch it).
  */
object StreamingEwma {

  case class KeyedPoint(k: Long, us: Long, vE6: Long)
  case class EwmaPoint(k: Long, us: Long, vE6: Long, ewmaE6: Long, devE6: Long)
  case class EwmaState(lastUs: Long, lastE: Long)

  /** Create-and-register the cross-batch out-of-order counter for
    * [[ewmaStream]]; read `.value` on the driver after each drain.
    */
  def outOfOrderCounter(spark: org.apache.spark.sql.SparkSession): LongAccumulator =
    spark.sparkContext.longAccumulator("graft_ewma_out_of_order")

  def ewmaStream(points: Dataset[KeyedPoint], alphaPpm: Long,
      outOfOrder: Option[LongAccumulator] = None): Dataset[EwmaPoint] = {
    require(alphaPpm >= 0 && alphaPpm <= 1000000L, "alphaPpm must be in [0, 10^6]")
    implicit val outEnc: Encoder[EwmaPoint] = Encoders.product[EwmaPoint]
    implicit val stEnc: Encoder[EwmaState] = Encoders.product[EwmaState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    points.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, rows: Iterator[KeyedPoint], state: GroupState[EwmaState]) =>
          // batch-fold order within the micro-batch; Vector materializes
          // BEFORE state.update (the returned iterator is consumed later)
          val sorted = rows.toVector.sortBy(p => (p.us, p.vE6))
          var st = state.getOption
          val out = sorted.map { p =>
            // Long.MinValue's abs wraps negative and would pass a bare
            // abs() check — test both bounds explicitly
            require(p.vE6 <= Events.EwmaMaxAbsVE6 && p.vE6 >= -Events.EwmaMaxAbsVE6,
              s"graft.StreamingEwma: |v_e6| outside the exact-recursion domain " +
                s"(<= ${Events.EwmaMaxAbsVE6}); got ${p.vE6} for key $k")
            val (e, d) = st match {
              case None => (p.vE6, 0L)
              case Some(s) =>
                // cross-batch out-of-order: the state already folded a
                // later event time, so this point folds in arrival order
                // and batch parity is gone for this key — count it.
                if (p.us < s.lastUs) outOfOrder.foreach(_.add(1L))
                // Long '/' truncates toward zero — the batch `div` exactly
                ((alphaPpm * p.vE6 + (1000000L - alphaPpm) * s.lastE) / 1000000L,
                  p.vE6 - s.lastE)
            }
            st = Some(EwmaState(p.us, e))
            EwmaPoint(k, p.us, p.vE6, e, d)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
