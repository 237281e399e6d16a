package graft

/** Invariants of the end-to-end dedup decision (dd_keep_list): the
  * value-level output is hash-checked against the DuckDB oracle by the
  * driver sweep; this suite pins the STRUCTURAL contract a downstream
  * training-data job relies on — the decision is a partition of the
  * corpus, and the dup_of graph resolves in one hop to a kept doc. */
class KeepListSpec extends SparkSpec {
  import spark.implicits._

  test("keep list partitions the corpus; drops resolve to kept docs") {
    val rows = queries.Dedup.qKeepList.run(spark, sf("sf0.001")).cache()
    val total = Tables.documents(spark, sf("sf0.001")).count()
    // conservation: exactly one decision per corpus document
    assert(rows.count() == total)
    assert(rows.select($"doc_id").distinct().count() == total)
    // kept rows carry no dup_of; dropped rows always carry one
    assert(rows.filter($"keep" && $"dup_of".isNotNull).count() == 0)
    assert(rows.filter(!$"keep" && $"dup_of".isNull).count() == 0)
    // reason agrees with the decision and covers the domain
    assert(rows.filter(!$"reason".isin("keep", "exact_dup", "near_dup"))
      .count() == 0)
    assert(rows.filter($"keep" && $"reason" =!= "keep").count() == 0)
    assert(rows.filter(!$"keep" && $"reason" === "keep").count() == 0)
    // one-hop resolution: every dropped doc's keeper is itself kept
    // (cluster min == its own exact canonical — see qKeepList scaladoc)
    val kept = rows.filter($"keep").select($"doc_id")
      .as[Long].collect().toSet
    val dupOf = rows.filter(!$"keep").select($"dup_of")
      .as[Long].collect()
    assert(dupOf.forall(kept.contains),
      "a dropped doc resolved to another dropped doc")
    // the fixture plants real duplicates — the gate must bite
    assert(dupOf.nonEmpty, "expected at least one drop in the fixture")
  }

  test("corpus yield conserves docs and agrees with dd_keep_list's drops") {
    import org.apache.spark.sql.functions._
    val y = queries.TextAnalysis.qCorpusYield.run(spark, sf("sf0.001")).cache()
    val total = Tables.documents(spark, sf("sf0.001")).count()
    // verdict counts partition each group and sum to the corpus
    assert(y.filter($"n_kept" + $"n_drop_dedup" + $"n_drop_quality" +
      $"n_drop_lang" =!= $"n_docs").count() == 0)
    assert(y.agg(sum($"n_docs")).head().getLong(0) == total)
    assert(y.filter($"n_tokens_kept" > $"n_tokens").count() == 0)
    // dedup precedence: the yield's dedup drops are exactly
    // dd_keep_list's drops (quality/lang never shadow them)
    val keepListDrops = queries.Dedup.qKeepList.run(spark, sf("sf0.001"))
      .filter(!$"keep").count()
    val yieldDedupDrops = y.agg(sum($"n_drop_dedup")).head().getLong(0)
    assert(yieldDedupDrops == keepListDrops)
  }

  test("dd_quality_keep_list: keeper is the cluster's best-quality copy") {
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    val r = queries.Dedup.qQualityKeepList.run(spark, d).cache()
    // scope: exactly the cluster table, one keeper per cluster
    val clusters = queries.Dedup.qDupClusters.run(spark, d).cache()
    assert(r.count() === clusters.count())
    assert(r.filter($"is_kept").count() ===
      clusters.select($"cluster_id").distinct().count())
    // the keeper really is in its own cluster
    val foreign = r.filter($"is_kept")
      .join(clusters.withColumnRenamed("doc_id", "keeper"),
        Seq("cluster_id", "keeper"), "left_anti").count()
    assert(foreign === 0, "keeper must be a member of its cluster")
    // argmax truth: recompute from t_quality_score (shared builder)
    val scores = queries.TextAnalysis.qQualityScore.run(spark, d)
      .select($"doc_id", $"quality_score").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val byCluster = r.select($"doc_id", $"cluster_id", $"keeper")
      .collect().groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      val members = rows.map(_.getLong(0))
      val keeper = rows.head.getLong(2)
      val best = members.map(id => (scores(id), -id)).max
      assert((scores(keeper), -keeper) === best,
        s"cluster $cid keeper must argmax (score, -id)")
    }
    // no member outscores its keeper
    val outscored = r
      .join(r.filter($"is_kept").select($"cluster_id",
        $"keeper_score".as("ks")), "cluster_id")
      .filter($"quality_score" > $"ks").count()
    assert(outscored === 0)
  }
}
