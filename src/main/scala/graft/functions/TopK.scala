package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate for bounded top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k as a typed Aggregator — the scale-safe replacement
  * for `row_number().over(partitionBy(group))` ranking when the group
  * count is small (e.g. 20 probes ranking millions of candidates):
  * the window shape funnels ALL candidate rows of a group through one
  * task, capping parallelism at #groups regardless of cluster size.
  *
  * With an Aggregator the hash-aggregate does map-side partials: every
  * input partition reduces its rows into a k-capped buffer locally, so
  * the shuffle carries ≤ k entries per partition per group and the
  * final per-group merge is O(partitions · k) — independent of N.
  *
  * Ordering: score DESC, id ASC (deterministic tie-break). The buffer
  * is a k-capped sorted Seq; for the small k used here insertion into
  * a sorted Seq beats heap bookkeeping.
  */
class BoundedTopK(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] with Serializable {

  private val ord: Ordering[Scored] =
    Ordering.by((e: Scored) => (-e.score, e.id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] =
    if (v.score.isNaN) buf // same policy as the native TopKAggregate:
    // NaN has no place in a total order, so it never enters the buffer
    else if (buf.length >= k && ord.lteq(buf.last, v)) buf // v can't rank
    else (buf :+ v).sorted(ord).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

/** One term candidate for per-group distinctive-term ranking. */
final case class TermScore(term: String, tf: Long, df: Long)

/** [[BoundedTopK]]'s string-keyed sibling for corpus term ranking:
  * k-capped buffer ordered by tf DESC (most frequent in the group),
  * df ASC (rarest across groups first — the "distinctive" tie-break),
  * term ASC (deterministic). Same scale shape: map-side partials keep
  * the shuffle at ≤ k entries per partition per group even when the
  * group count is tiny (a handful of sources ranking a whole corpus
  * vocabulary). */
class TermTopK(k: Int)
    extends Aggregator[TermScore, Seq[TermScore], Seq[TermScore]]
    with Serializable {

  private val ord: Ordering[TermScore] =
    Ordering.by((e: TermScore) => (-e.tf, e.df, e.term))

  override def zero: Seq[TermScore] = Seq.empty

  override def reduce(buf: Seq[TermScore], v: TermScore): Seq[TermScore] =
    if (buf.length >= k && ord.lteq(buf.last, v)) buf
    else (buf :+ v).sorted(ord).take(k)

  override def merge(a: Seq[TermScore], b: Seq[TermScore]): Seq[TermScore] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[TermScore]): Seq[TermScore] = buf

  override def bufferEncoder: Encoder[Seq[TermScore]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermScore]] = ExpressionEncoder()
}
