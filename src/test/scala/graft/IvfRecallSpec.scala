package graft

import graft.queries.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gate for the IVF family: nprobe is a recall dial, and the
  * candidate-superset argument (a probe's nprobe=2 cells strictly
  * contain its nprobe=1 cell; every corpus vector lives in exactly one
  * cell) makes recall@5 vs brute force monotone in nprobe PER PROBE —
  * if a new candidate displaces a brute-force-top-5 member from the
  * top 5, it outranks that member globally and is itself in the
  * brute-force top 5. This spec asserts that invariant end-to-end
  * through the registry builders (ivfTopK vs cosineTopK), so the
  * multi-probe query can never silently lose recall. */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  private def top5(df: DataFrame): DataFrame =
    df.select($"probe_id", $"vec_id")

  private def recallPerProbe(approx: DataFrame, bf: DataFrame): DataFrame =
    top5(bf).join(top5(approx), Seq("probe_id", "vec_id"), "left_semi")
      .groupBy($"probe_id").agg(count(lit(1)).as("hits"))

  test("nprobe=2 recall@5 is per-probe monotone over nprobe=1 and lifts aggregate recall") {
    val d = sf("sf0.001")
    val bf = Similarity.cosineTopK(Tables.embeddings(spark, d)).cache()
    val r1 = recallPerProbe(Similarity.ivfTopK(spark, d, nprobe = 1), bf)
      .withColumnRenamed("hits", "h1")
    val r2 = recallPerProbe(Similarity.ivfTopK(spark, d, nprobe = 2), bf)
      .withColumnRenamed("hits", "h2")
    val joined = r1.join(r2, Seq("probe_id"), "full_outer")
      .select($"probe_id",
        coalesce($"h1", lit(0L)).as("h1"), coalesce($"h2", lit(0L)).as("h2"))
      .cache()
    val regressions = joined.filter($"h2" < $"h1").count()
    assert(regressions === 0,
      "every probe's recall@5 must be >= its single-probe recall")
    val totals = joined.agg(sum($"h1"), sum($"h2")).head()
    val (tot1, tot2) = (totals.getLong(0), totals.getLong(1))
    assert(tot2 >= tot1, s"aggregate recall must not drop: $tot2 < $tot1")
    // the second-probe cell must actually contribute on this fixture
    // (10 random-centroid cells, near-random vectors: plenty of
    // boundary probes), otherwise the knob isn't being exercised
    assert(tot2 > tot1,
      s"nprobe=2 should strictly improve aggregate recall here ($tot1 -> $tot2)")
  }
}
