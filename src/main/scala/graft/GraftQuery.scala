package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's correctness/bench surface.
  *
  * @param name    stable id; keys `SparkEntry.queries` and the driver's
  *                CORRECTNESS/BENCH reports
  * @param run     Spark plan over the parquet tables in `sfDir`
  * @param oracle  equivalent ANSI SQL for DuckDB over the same tables;
  *                None → driver records a weaker rows-only check
  * @param bench   include in the headline Bench set
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[GraftQuery] =
    queries.Relational.all ++
      queries.Cleaning.all ++
      queries.TextAnalysis.all ++
      queries.Dedup.all ++
      queries.Similarity.all ++
      queries.EventWindows.all ++
      queries.Cdc.all ++
      queries.Multimodal.all

  lazy val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
