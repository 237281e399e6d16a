package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.{Column, DataFrame}

/** Streaming twin of `q_mv_merge`: continuous materialized-view
  * maintenance over an unbounded fact stream.
  *
  * Deliberately ZERO custom state code — the MV algebra
  * ([[IncrementalAgg.accumulators]], count / exact decimal sum /
  * min / max) is exactly what Spark's native streaming aggregation
  * maintains incrementally, so the right implementation is to declare
  * the same aggregate over `readStream` and let the engine's state
  * store BE the partial-aggregate artifact. Each micro-batch folds in
  * with the identical merge the batch operator applies across slices;
  * because the accumulators are associative and integer-exact, the
  * streamed MV after any prefix of the stream equals the batch
  * partial over the same rows — bit for bit, for every micro-batch
  * split (StreamingMvSpec pins this).
  *
  * Scale shape: state is MV-cardinality (one row per group key), the
  * only shuffle is the hash partition every stateful op pays, and the
  * sink sees `IncrementalAgg.present` rows in complete/update mode.
  */
object StreamingMv {

  /** The continuously-maintained partial: compose with
    * `.writeStream.outputMode("complete"|"update")`. */
  def partial(stream: DataFrame, keys: Seq[String], value: Column,
      ts: Column): DataFrame =
    IncrementalAgg.partial(stream, keys, value, ts)

  /** User-facing MV rows (averages re-derived from exact sums). */
  def view(stream: DataFrame, keys: Seq[String], value: Column,
      ts: Column): DataFrame =
    IncrementalAgg.present(partial(stream, keys, value, ts), keys)
}
