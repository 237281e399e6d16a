package graft

import org.apache.spark.sql.functions._

/** Gates for the label-aware similarity pair: hard-negative mining
  * (sim_hard_negatives) and the leave-one-out k-NN confusion matrix
  * (sim_knn_eval). Bulk correctness is oracle-gated; these pin the
  * cross-query consistency an aggregate hash-compare can miss — the
  * two queries and sim_knn_graph all ride ONE candidate machinery, so
  * their outputs must agree with each other, and the vote/argmax is
  * replayed in plain Scala off the knn graph itself. */
class KnnEvalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def labels() =
    Tables.embeddings(spark, dir).select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("sim_hard_negatives: cross-label, unique per anchor, consistent with knn top-1") {
    val lab = labels()
    val hn = queries.Similarity.qHardNegatives.run(spark, dir).collect()
    assert(hn.nonEmpty)
    assert(hn.map(_.getLong(0)).distinct.length == hn.length,
      "one hard negative per anchor")
    hn.foreach { r =>
      assert(r.getInt(1) != r.getInt(3), "anchor and negative share a label")
      assert(lab(r.getLong(0)) == r.getInt(1))
      assert(lab(r.getLong(2)) == r.getInt(3))
    }
    // Same candidate set as sim_knn_graph → the cross-label max can
    // never beat the overall max, and when the overall rank-1
    // neighbor is itself cross-label the two must coincide exactly.
    val knn1 = queries.Similarity.qKnnGraph.run(spark, dir)
      .filter($"rk" === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val hnAnchors = hn.map(_.getLong(0)).toSet
    assert(hnAnchors.subsetOf(knn1.keySet))
    hn.foreach { r =>
      val (n1, c1) = knn1(r.getLong(0))
      assert(r.getDouble(4) <= c1 + 1e-12,
        s"hard-negative cosine beats the overall top-1 for ${r.getLong(0)}")
      if (lab(n1) != r.getInt(1))
        assert(r.getDouble(4) == c1 && r.getLong(2) == n1,
          s"cross-label rank-1 must BE the hard negative for ${r.getLong(0)}")
    }
  }

  test("sim_knn_eval: confusion matrix equals an in-memory vote replay") {
    val lab = labels()
    val knn = queries.Similarity.qKnnGraph.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Replay: per anchor, majority label among its ≤3 neighbors, ties
    // to the smallest label; then roll up (true, predicted) counts.
    val expected = knn.groupBy(_._1).toSeq.map { case (a, rows) =>
      val votes = rows.map(t => lab(t._2)).groupBy(identity)
        .map { case (l, v) => (l, v.size) }
      val best = votes.toSeq.map { case (l, n) => (-n, l) }.min._2
      (lab(a), best) // keep as Seq — a Map here would collapse dup cells
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
    val got = queries.Similarity.qKnnEval.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected.toSet)
    // Every anchor lands in exactly one confusion cell.
    assert(got.toSeq.map(_._3).sum == knn.map(_._1).distinct.length)
  }
}
