package graft

import org.apache.spark.sql.functions._

/** Gate for sim_gram_matrix: the 64×64 second-moment table must equal
  * a cell-for-cell in-memory recomputation from the raw floats, and
  * carry the symmetry/diagonal structure a Gram matrix cannot lack.
  * Value-level cross-engine truth is oracle-gated; this pins the
  * quantization and the double-explode indexing against an
  * independent formulation. */
class GramMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("sim_gram_matrix equals the in-memory outer-product sum") {
    val dir = sf("sf0.001")
    val vecs = Tables.embeddings(spark, dir)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * 10000 + 0.5).toLong))
    val dim = vecs.head.length
    val expect = Array.ofDim[Long](dim, dim)
    for (v <- vecs; i <- 0 until dim; j <- 0 until dim)
      expect(i)(j) += v(i) * v(j)

    val got = queries.Similarity.qGramMatrix.run(spark, dir).collect()
    assert(got.length == dim * dim)
    got.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      assert(r.getLong(2) == expect(i)(j), s"cell ($i,$j)")
    }
    // Structure: symmetric, non-negative diagonal.
    for (i <- 0 until dim) {
      assert(expect(i)(i) >= 0)
      for (j <- 0 until dim) assert(expect(i)(j) == expect(j)(i))
    }
  }

  test("sim_top_component captures near-maximal variance (Rayleigh gate)") {
    // The synthetic corpus's Gram spectrum is nearly flat
    // (λ₂/λ₁ ≈ 0.93 here), so the top DIRECTION is ill-conditioned —
    // any λ₁-tier mixture serves whitening/ABTT equally. The stable
    // numerical contract is the RAYLEIGH QUOTIENT: the fixed-point
    // result must capture ≥ 0.99 of the variance a fully-converged
    // double-precision power iteration reaches.
    val dir = sf("sf0.001")
    val g = queries.Similarity.qGramMatrix.run(spark, dir).collect()
    val dim = 64
    val mat = Array.ofDim[Double](dim, dim)
    g.foreach(r => mat(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) =
      r.getLong(2).toDouble)
    def rayleigh(v: Array[Double]): Double = {
      val gv = Array.tabulate(dim)(i =>
        (0 until dim).map(j => mat(i)(j) * v(j)).sum)
      (0 until dim).map(i => v(i) * gv(i)).sum /
        v.map(a => a * a).sum
    }
    // converged double-precision reference (600 rounds ≫ any gap)
    var x = Array.fill(dim)(1.0)
    for (_ <- 1 to 600) {
      val y = Array.tabulate(dim)(i =>
        (0 until dim).map(j => mat(i)(j) * x(j)).sum)
      val n = math.sqrt(y.map(v => v * v).sum)
      x = y.map(_ / n)
    }
    val lambdaTop = rayleigh(x)

    val got = queries.Similarity.qTopComponent.run(spark, dir).collect()
      .map(r => r.getLong(0).toInt - 1 -> r.getLong(1).toDouble).toMap
    val v = Array.tabulate(dim)(got(_))
    val ratio = rayleigh(v) / lambdaTop
    assert(ratio >= 0.99,
      f"fixed-point component captures only $ratio%.4f of max variance")
  }
}
