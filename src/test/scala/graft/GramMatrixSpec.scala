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
}
