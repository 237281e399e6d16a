package graft

import org.apache.spark.sql.SparkSession

/** The library's SQL front door: one call wires a session so plain
  * `spark.sql` users get the full engine surface with no Scala API —
  * the switch-over story for a SQL-only user of the reference.
  *
  *  - base tables (`region` … `embeddings`) as temp views over the
  *    parquet dataset directory, with the engine's canonical readers
  *    (e.g. the events nanosecond→microsecond truncation) applied;
  *  - every registry query as a view `graft_<name>` (lazy plans —
  *    nothing runs until queried) when `withQueryViews` is set;
  *  - the native SQL functions + the i128-sum optimizer rule via
  *    [[GraftExtensions.register]].
  *
  * `withQueryViews` caveat: most registry plans are fully lazy, but
  * the dedup family materializes its shared MinHash signature table
  * (and dd_dup_clusters runs its iterative fixpoint) at PLAN BUILD
  * time — registering those views pays that once, up front, per
  * (session, dataset). Default off so table-only wiring stays
  * instant.
  */
object Graft {

  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String,
      withQueryViews: Boolean = false): Unit = {
    GraftExtensions.register(spark)
    baseTables.foreach {
      case "events" =>
        Tables.events(spark, dir).createOrReplaceTempView("events")
      case t =>
        Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    if (withQueryViews) {
      Registry.all.foreach { q =>
        q.run(spark, dir).createOrReplaceTempView(s"graft_${q.name}")
      }
    }
  }
}
