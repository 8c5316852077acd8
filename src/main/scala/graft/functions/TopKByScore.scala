package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One scored candidate of a similarity probe. */
case class ScoredVec(probe_id: Long, vec_id: Long, cos_sim: Double)

/** Typed top-k Aggregator (SURVEY.md §2.10 — the `Reducer.reduce` /
  * bounded-TreeMap-in-cleanup() extension point as a Spark `Aggregator`).
  *
  * Each partition folds its rows into a ≤k buffer (`reduce`), partitions
  * merge pairwise (`merge`) — Spark plans this as partial+final aggregate,
  * so only k rows per group per partition ever cross the shuffle. That is
  * the 100-TB shape for top-k-per-probe: a window row_number() would
  * shuffle EVERY candidate row to its probe's partition first.
  *
  * Ordering is strict (score desc, vec_id asc — vec_id unique), so the
  * result is deterministic under any partitioning / merge order.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredVec, Seq[ScoredVec], Seq[ScoredVec]] {

  private def best(xs: Seq[ScoredVec]): Seq[ScoredVec] =
    xs.sortBy(x => (-x.cos_sim, x.vec_id)).take(k)

  def zero: Seq[ScoredVec] = Nil
  def reduce(buf: Seq[ScoredVec], a: ScoredVec): Seq[ScoredVec] = best(buf :+ a)
  def merge(b1: Seq[ScoredVec], b2: Seq[ScoredVec]): Seq[ScoredVec] = best(b1 ++ b2)
  def finish(r: Seq[ScoredVec]): Seq[ScoredVec] = r

  def bufferEncoder: Encoder[Seq[ScoredVec]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[ScoredVec]] = ExpressionEncoder()
}
