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

  test("adc recall@5 vs exact cosine clears the compression floor") {
    val d = sf("sf0.001")
    // exact top-5 per probe, replayed driver-side on the same
    // quantized integers (500 vectors — trivial here; the point is an
    // independent reference, not scale)
    val vecs = Tables.embeddings(spark, d)
      .select($"vec_id",
        graft.functions.VectorExpressions.quantize($"embedding").as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .filter { case (_, v) => v.exists(_ != 0L) }
    val norms = vecs.map { case (id, v) =>
      id -> math.sqrt(v.map(x => x.toDouble * x).sum) }.toMap
    def exactTop5(p: Long): Set[Long] = {
      val pv = vecs.find(_._1 == p).get._2
      vecs.filter(_._1 != p).map { case (v, vv) =>
        val dot = pv.zip(vv).map { case (a, b) => a.toDouble * b }.sum
        (BigDecimal(dot / (norms(p) * norms(v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP), -v)
      }.sortBy(t => (t._1, t._2)).reverse.take(5).map(-_._2).toSet
    }
    val adc = queries.Similarity.qPqAdcTopK.run(spark, d).collect()
      .groupBy(_.getLong(0)).map { case (p, rs) =>
        p -> rs.map(_.getLong(1)).toSet }
    val recall = adc.map { case (p, got) =>
      (got & exactTop5(p)).size / 5.0 }.sum / adc.size
    // measured 0.24 on this fixture vs ~0.01 random chance (5/499);
    // the gate sits well under the measurement, far over chance —
    // 2-byte codes keeping ~a quarter of exact top-5 is the
    // compression trade working, not luck
    assert(recall >= 0.1, f"adc recall@5 $recall%.3f below the 0.1 floor")
  }

  test("pq fit: one row per coded vector, fits in [-1,1] (or the -2 sentinel)") {
    val d = sf("sf0.001")
    val fit = queries.Similarity.qPqFit.run(spark, d).collect()
    val coded = queries.Similarity.qPqCodes.run(spark, d).count()
    assert(fit.length == coded, "fit report covers exactly the coded set")
    fit.foreach { r =>
      (1 to 4).map(r.getDouble).foreach(f =>
        assert((f >= -1.0 && f <= 1.0) || f == -2.0, s"fit out of range: $r"))
    }
    // a trained codebook fits its own corpus better than orthogonal:
    // the corpus-mean summed fit is positive
    val mean = fit.map(_.getDouble(5)).sum / fit.length
    assert(mean > 0.0, f"mean fit_sum $mean%.4f should be positive")
  }

  test("zero-norm subvector falls deterministically to cell 0") {
    // vec 100: subspace 0 all-zero (no cosine exists there), subspaces
    // 1-3 nonzero; the whole vector has positive norm so it IS coded.
    // The -2.0 fallback must send the degenerate slice to cell 0.
    val dim = 64
    def vec(f: Int => Float): Seq[Float] = (0 until dim).map(f)
    val rows = (0L until 16L).map { i =>
      (i, vec(p => ((p + i + 1) % 7 + 1).toFloat / 10f))
    } :+ (100L, vec(p => if (p < 16) 0f else 0.5f))
    val dir = java.nio.file.Files.createTempDirectory("pqzero").toString
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = queries.Similarity.qPqCodes.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    assert(out.contains(100L), "nonzero full vector must be coded")
    assert(out(100L).head == 0,
      s"zero subvector must land in cell 0, got ${out(100L)}")
    out(100L).tail.foreach(c => assert(c >= 0 && c < 16))
  }
}
