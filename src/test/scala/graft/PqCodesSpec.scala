package graft

import org.apache.spark.sql.functions._

/** sim_pq_codes: every nonzero-norm vector gets one 4-subspace code,
  * codes stay in the 4-bit codebook range, the packed code is exactly
  * the base-16 composition, and the training is deterministic. */
class PqCodesSpec extends SparkSpec {
  import spark.implicits._

  test("pq codes: coverage, bounds, packing, determinism") {
    val d = sf("sf0.001")
    val rows = queries.Similarity.qPqCodes.run(spark, d).collect()
    val nonzero = Tables.embeddings(spark, d)
      .select($"vec_id",
        graft.functions.VectorExpressions.quantize($"embedding").as("q"))
      .filter(expr("aggregate(transform(q, x -> x * x), 0L, (a, x) -> a + x)") > 0)
      .count()
    assert(rows.length == nonzero, "one code row per nonzero-norm vector")
    rows.foreach { r =>
      val cs = (1 to 4).map(r.getInt)
      cs.foreach(c => assert(c >= 0 && c < 16, s"code out of range: $r"))
      assert(r.getInt(5) == cs(0) + 16 * cs(1) + 256 * cs(2) + 4096 * cs(3))
    }
    // the codebook is non-degenerate: the corpus spreads over cells
    assert(rows.map(_.getInt(5)).distinct.length > 1)
    // deterministic training: a second run yields identical codes
    val again = queries.Similarity.qPqCodes.run(spark, d).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("adc top-k: 5 ranked non-self hits per probe, scores non-increasing") {
    val d = sf("sf0.001")
    val rows = queries.Similarity.qPqAdcTopK.run(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet == (0L until 10L).toSet, "every probe answers")
    byProbe.values.foreach { hits =>
      assert(hits.map(_._4).sorted.toSeq == (1 to 5), "ranks are 1..5")
      hits.foreach { case (p, v, _, _) => assert(v != p, "self excluded") }
      val byRank = hits.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "adc scores non-increasing in rank")
    }
  }
}
