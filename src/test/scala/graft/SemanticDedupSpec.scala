package graft

import graft.functions.VectorExpressions
import graft.queries.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Semantic-dedup (dd_semantic_dedup) gates, exercised through the
  * SAME parameterized entry the registry uses (Dedup.semanticDedup):
  *
  *  - the uncapped verdict must equal a brute-force replay of the
  *    greedy-by-id rule over full within-cell pairwise cosine;
  *  - kept in-scope vectors must form an independent set under the
  *    ≥ θ relation (no two kept cell-mates are near-dups — the
  *    SemDeDup contract);
  *  - the per-cell cap must bound pair work deterministically: the
  *    in-scope set is exactly the `cap` lowest ids per cell, and
  *    out-of-scope vectors are all kept (no silent drops).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val theta = 0.42

  private lazy val verdict =
    Dedup.semanticDedup(spark, sf("sf0.001"), cap = 256, threshold = theta)
      .cache()

  /** Full within-cell directed near-pairs (no cap — sf0.001 cells are
    * all under 256, so the registry cap admits every vector). */
  private lazy val nearPairs = {
    val sig = Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", VectorExpressions.quantize($"embedding").as("q"))
      .withColumn("qn",
        sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")))
      .filter($"qn" > 0)
    val cells = sig.join(Similarity.kmeansAssign(spark, sf("sf0.001")), "vec_id")
    val a = cells.select($"cell", $"vec_id".as("a_id"), $"q".as("aq"),
      $"qn".as("an"))
    val b = cells.select($"cell", $"vec_id".as("b_id"), $"q".as("bq"),
      $"qn".as("bn"))
    a.join(b, Seq("cell"))
      .filter($"a_id" =!= $"b_id")
      .filter(round(VectorExpressions.quantizedDot($"aq", $"bq").cast("double") /
        ($"an" * $"bn"), 6) >= theta)
      .select($"a_id", $"b_id")
      .cache()
  }

  test("verdict equals brute-force greedy-by-id replay") {
    val expectDrop = nearPairs.filter($"b_id" < $"a_id")
      .select($"a_id".as("vec_id")).distinct()
    val gotDrop = verdict.filter(!$"keep").select($"vec_id")
    assert(gotDrop.exceptAll(expectDrop).isEmpty &&
      expectDrop.exceptAll(gotDrop).isEmpty,
      "dropped set must equal {v : ∃ u < v in cell with cos ≥ θ}")
    val expectNear = nearPairs.groupBy($"a_id".as("vec_id"))
      .agg(count(lit(1)).as("en"))
    val mism = verdict.join(expectNear, Seq("vec_id"), "left")
      .filter($"n_near" =!= coalesce($"en", lit(0L))).count()
    assert(mism == 0, s"$mism vectors disagree on n_near with brute force")
  }

  test("kept vectors form an independent set under the near relation") {
    val kept = verdict.filter($"keep" && $"in_scope").select($"vec_id")
    val viol = nearPairs
      .join(kept.withColumnRenamed("vec_id", "a_id"), "a_id")
      .join(kept.withColumnRenamed("vec_id", "b_id"), "b_id")
      .count()
    assert(viol == 0,
      s"$viol near-pairs survive between kept vectors — greedy rule broken")
  }

  test("cap admits exactly the lowest ids per cell and drops no verdict") {
    val capped =
      Dedup.semanticDedup(spark, sf("sf0.001"), cap = 10, threshold = theta)
    val scopeCounts = capped.filter($"in_scope")
      .groupBy($"cell").agg(count(lit(1)).as("n"),
        max($"vec_id").as("max_in"))
    assert(scopeCounts.filter($"n" > 10).count() == 0,
      "no cell may have more than cap in-scope vectors")
    // in-scope = the cap LOWEST ids: every out-of-scope id exceeds its
    // cell's in-scope max, and out-of-scope verdicts are all keep
    val out = capped.filter(!$"in_scope")
    assert(out.filter(!$"keep").count() == 0,
      "out-of-scope vectors must be kept (no silent drops)")
    val belowMax = out.join(scopeCounts, "cell")
      .filter($"vec_id" < $"max_in").count()
    assert(belowMax == 0,
      "an out-of-scope id below the in-scope max breaks determinism")
  }

  test("verdict is deterministic across runs") {
    val again =
      Dedup.semanticDedup(spark, sf("sf0.001"), cap = 256, threshold = theta)
    assert(verdict.exceptAll(again).isEmpty && again.exceptAll(verdict).isEmpty)
  }
}
