package graft

import graft.queries.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-norm vector policy, pinned on the engine side of the cosine
  * family: a vector of all zeros has cosine NaN against everything,
  * the native TopKAggregate refuses to rank NaN, and DuckDB's IEEE
  * ordering would rank it FIRST (NaN sorts greatest under DESC) — so
  * both the queries and their oracles filter `qn > 0` up front, and
  * this suite proves the engine half: zero-norm vectors appear
  * nowhere in the output (neither as probe nor as neighbor) and no
  * NaN cosine ever surfaces. The oracle half is the symmetric
  * `WHERE list_sum(q[i]*q[i]) > 0` in the q CTEs, exercised by the
  * driver's DuckDB comparison at every sweep. */
class ZeroNormSpec extends SparkSpec {
  import spark.implicits._

  /** 30 deterministic 64-d vectors with two all-zero plants: vec_id 5
    * (a probe slot — probes are vec_id < 20) and vec_id 25 (corpus). */
  private lazy val emb: DataFrame = {
    val rows = (0 until 30).map { v =>
      val e =
        if (v == 5 || v == 25) Seq.fill(64)(0.0f)
        else (0 until 64).map(i =>
          (((v * 64 + i) * 2654435761L % 2000) - 1000) / 1000.0f)
      (v.toLong, e)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosineTopK: zero-norm vectors are neither probes nor neighbors") {
    val out = Similarity.cosineTopK(emb).cache()
    val probes = out.select($"probe_id").distinct().as[Long].collect().toSet
    val neighbors = out.select($"vec_id").distinct().as[Long].collect().toSet
    assert(!probes.contains(5L), "zero-norm probe must be dropped")
    assert(!neighbors.contains(5L) && !neighbors.contains(25L),
      "zero-norm vectors must never appear as neighbors")
    assert(out.filter(isnan($"cosine")).count() == 0, "no NaN cosine")
    // the surviving probes still rank a full non-degenerate corpus
    assert(probes == ((0L until 20L).toSet - 5L))
  }

  test("embeddingNearDup: zero-norm vectors are absent from both sides") {
    val out = Dedup.embeddingNearDup(emb, tables = 2, bits = 4,
      cap = 128, threshold = 0.42).cache()
    val as = out.select($"a_id").as[Long].collect().toSet
    val bs = out.select($"nearest_in_bucket").as[Long].collect().toSet
    assert(!as.contains(5L) && !as.contains(25L))
    assert(!bs.contains(5L) && !bs.contains(25L))
    assert(out.filter(isnan($"cosine")).count() == 0, "no NaN cosine")
  }
}
