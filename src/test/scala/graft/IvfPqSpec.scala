package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._

/** Invariants for the composed IVF-PQ search (sim_ivfpq_topk):
  * the coarse quantizer only ever PRUNES (results must come from the
  * probe's own trained cell) and the PQ scan only ever SCORES (a
  * surviving pair's ADC score must be bit-identical to the unpruned
  * sim_pq_adc_topk scan's score for that pair) — so the composition
  * can drift from neither parent without a spec failure naming the
  * leg that broke. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val d = sf("sf0.001")

  test("every IVF-PQ result lives in its probe's coarse cell, 5-per-probe, contiguous ranks") {
    val out = Registry.byName("sim_ivfpq_topk").run(spark, d).cache()
    val coarse = Similarity.kmeansAssign(spark, d).cache()
    val probeCell = coarse.select($"vec_id".as("p_id"), $"cell".as("pcell"))
    val resCell = coarse.select($"vec_id", $"cell".as("vcell"))
    val escaped = out.join(probeCell, "p_id").join(resCell, "vec_id")
      .filter($"pcell" =!= $"vcell").count()
    assert(escaped === 0, "coarse pruning must be a pure filter")
    val badShape = out.groupBy($"p_id")
      .agg(count(lit(1)).as("n"), max($"rk").as("maxrk"),
        countDistinct($"rk").as("nrk"))
      .filter($"n" > 5 || $"maxrk" =!= $"n" || $"nrk" =!= $"n").count()
    assert(badShape === 0, "per-probe top-5 with contiguous 1..n ranks")
  }

  test("surviving pairs carry the exact unpruned ADC score") {
    val ivfpq = Registry.byName("sim_ivfpq_topk").run(spark, d)
      .select($"p_id", $"vec_id", $"adc_score".as("pruned_score"))
    val adc = Registry.byName("sim_pq_adc_topk").run(spark, d)
      .select($"p_id", $"vec_id", $"adc_score".as("full_score"))
    val joined = ivfpq.join(adc, Seq("p_id", "vec_id")).cache()
    assert(joined.count() > 0,
      "fixture must produce overlap between pruned and unpruned top-5s")
    val drift = joined.filter($"pruned_score" =!= $"full_score").count()
    assert(drift === 0, "ADC scores are cell-independent by construction")
  }
}
