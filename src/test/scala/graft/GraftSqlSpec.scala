package graft

/** The SQL front door: after one registerViews call, a SQL-only user
  * can read every base table, query every registry view, and call the
  * native functions — no Scala API anywhere. */
class GraftSqlSpec extends SparkSpec {

  test("base tables are queryable as views with canonical readers") {
    Graft.registerViews(spark, sf("sf0.001"))
    Graft.baseTables.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) > 0, t)
    }
    // events view carries the micro-truncated timestamp type
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("query views expose the registry to SQL users") {
    Graft.registerViews(spark, sf("sf0.001"), withQueryViews = true)
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft_t_quality_score WHERE keep").head().getLong(0)
    assert(n > 0)
    // a joined use: flag documents whose quality passes but that sit
    // in a duplicate cluster — pure SQL over two registry views
    val joined = spark.sql("""
      SELECT q.doc_id FROM graft_t_quality_score q
      JOIN graft_dd_dup_clusters c ON c.doc_id = q.doc_id
      WHERE q.keep""").count()
    assert(joined >= 0)
  }

  test("native functions work over the registered views") {
    Graft.registerViews(spark, sf("sf0.001"))
    val sig = spark.sql(
      "SELECT shingle_minhash(text) AS sig FROM documents LIMIT 1").head()
    assert(sig.getSeq[Long](0).length == 8)
  }
}
