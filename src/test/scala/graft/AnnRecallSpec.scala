package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN quality gate for the LSH scale path: multi-table
  * random-hyperplane bucketing (8 tables × 4 planes) must recover the
  * brute-force nearest neighbor for most probes while touching fewer
  * pairs than brute force. This fixture is near-random (median NN
  * cosine ≈ 0.36 — no cluster structure), which is the WORST case for
  * LSH; expected single-NN recall at 8×4 is ~0.7 by the
  * (1-θ/π)^bits collision model. On clustered real-world embeddings
  * the same construction shrinks the pair space by orders of
  * magnitude. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val nTables = 8
  private val bitsPerTable = 4

  private lazy val vecs = Tables.embeddings(spark, sf("sf0.001"))
    .select($"vec_id", VectorExpressions.quantize($"embedding").as("q"))
    .cache()

  private def planeSign(j: Int)(qv: org.apache.spark.sql.Column) =
    when(aggregate(zip_with(qv, sequence(lit(0), lit(63)),
      (x, i) => {
        val lcg = (i + lit(64L * j)) * 1103515245L + 12345L
        when(shiftright(lcg, 16).bitwiseAND(1) === 1, x).otherwise(-x)
      }), lit(0L), (acc, z) => acc + z) >= 0, 1L).otherwise(0L)

  /** vec_id, q, b0..b7 — one bucket id per hash table. */
  private lazy val bucketed = {
    val cols = $"vec_id" +: $"q" +: (0 until nTables).map { t =>
      (0 until bitsPerTable)
        .map(j => planeSign(t * bitsPerTable + j)($"q") * (1L << j))
        .reduce(_ + _).as(s"b$t")
    }
    vecs.select(cols: _*).cache()
  }

  test("multi-table LSH touches fewer pairs than brute force") {
    val n = vecs.count()
    val brute = n * (n - 1) / 2
    val work = (0 until nTables).map { t =>
      bucketed.groupBy(col(s"b$t")).count()
        .select(sum(($"count" * ($"count" - 1) / 2).cast("long"))).as[Long].head()
    }.sum
    assert(work < brute,
      s"multi-table pair work $work must undercut brute force $brute")
  }

  test("multi-table LSH top-1 recall ≥ 50% vs brute force") {
    val probes = bucketed.filter($"vec_id" < 30)
    val probeColList = Seq($"vec_id".as("pid"), $"q".as("pq")) ++
      (0 until nTables).map(t => col(s"b$t").as(s"pb$t"))
    val probeCols = probes.select(probeColList: _*)

    val cos = VectorExpressions.quantizedDot($"pq", $"q").cast("double") /
      (sqrt(VectorExpressions.quantizedDot($"pq", $"pq").cast("double")) *
       sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")))
    val w = Window.partitionBy($"pid").orderBy(desc("c"), $"vec_id".asc)

    val bf = vecs.crossJoin(broadcast(probes.select($"vec_id".as("pid"), $"q".as("pq"))))
      .filter($"vec_id" =!= $"pid")
      .select($"pid", $"vec_id", cos.as("c"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"pid", $"vec_id".as("bf_nn"))

    // candidates: same bucket in ANY table (union of per-table joins)
    val cands = (0 until nTables).map { t =>
      bucketed.join(broadcast(probeCols),
          col(s"b$t") === col(s"pb$t") && $"vec_id" =!= $"pid")
        .select($"pid", $"vec_id", $"pq", $"q")
    }.reduce(_ union _).distinct()

    val lsh = cands.select($"pid", $"vec_id", cos.as("c"))
      .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"pid", $"vec_id".as("lsh_nn"))

    val joined = bf.join(lsh, Seq("pid"), "left")
    val recall = joined.filter($"bf_nn" === $"lsh_nn").count().toDouble /
      joined.count()
    assert(recall >= 0.5, f"8×4 multi-table recall $recall%.2f below 0.5")
  }
}
