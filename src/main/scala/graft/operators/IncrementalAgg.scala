package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental materialized-view maintenance: keep an aggregate fresh
  * by merging the last materialized partial with the partial of the
  * newly-arrived slice, instead of rescanning the fact table.
  *
  * This is the 100 TB refresh contract: each ingest batch contributes
  * one partial-aggregate artifact (MV-cardinality rows, not fact
  * rows), and a refresh costs O(|delta| + |MV|) — the historical fact
  * partitions are never re-read. The algebra only works if every
  * accumulator is associative AND exact, so the money column is
  * carried as DECIMAL(28,6) sums (Spark widens to DECIMAL(38,6);
  * integer-exact, so merge order and split placement cannot change
  * the result) and only [[present]] converts to double. Derived
  * measures (averages) are never accumulated — they are re-derived
  * from the merged exact sums, the standard MV decomposition.
  *
  * Reference analog: the nightly re-aggregation jobs the reference
  * re-runs from scratch (hunter.py full-rescan loops); re-expressed
  * as composable partial aggregates, which is the Spark-native form
  * (map-side partials are exactly this algebra inside one job — this
  * operator lifts it across jobs).
  */
object IncrementalAgg {

  /** The composable accumulator set — ONE definition shared by the
    * batch partial and the streaming maintainer
    * ([[graft.streaming.StreamingMv]]), so the two twins cannot drift
    * on the algebra. */
  private[graft] def accumulators(value: Column, ts: Column): Seq[Column] =
    Seq(
      count(lit(1)).as("cnt"),
      sum(value.cast(DecimalType(28, 6))).as("sum_dec"),
      min(ts).as("first_ts"),
      max(ts).as("last_ts"))

  /** One partial-aggregate row per key: composable accumulators only
    * (count / exact decimal sum / min / max — no averages). */
  def partial(df: DataFrame, keys: Seq[String], value: Column,
      ts: Column): DataFrame = {
    val accs = accumulators(value, ts)
    df.groupBy(keys.map(col): _*).agg(accs.head, accs.tail: _*)
  }

  /** Merge any number of partials (stacked with unionByName): each
    * accumulator folds with its own combine op. Exactness of sum_dec
    * makes this independent of how the fact table was sliced. */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*).agg(
      sum(col("cnt")).as("cnt"),
      sum(col("sum_dec")).as("sum_dec"),
      min(col("first_ts")).as("first_ts"),
      max(col("last_ts")).as("last_ts"))

  /** Presentation view: convert exact accumulators to the user-facing
    * schema, deriving the average from the merged sums. */
  def present(merged: DataFrame, keys: Seq[String]): DataFrame =
    merged.select(keys.map(col) ++ Seq(
      col("cnt").as("n_orders"),
      col("sum_dec").cast(DoubleType).as("revenue"),
      (col("sum_dec").cast(DoubleType) / col("cnt")).as("avg_price"),
      col("first_ts").as("first_date"),
      col("last_ts").as("last_date")): _*)
}
