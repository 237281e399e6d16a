package graft

import graft.queries.{EventWindows, Relational, TextAnalysis}
import org.apache.spark.sql.functions._

/** Structural invariants for the round-6 analytics additions, checked
  * against independent recomputations (the value-level truth is pinned
  * by the DuckDB oracle; these gate the properties a hash can't see). */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val d = sf("sf0.001")

  test("q_pivot_status conserves the orders corpus and matches per-status totals") {
    val piv = Relational.qPivotStatus.run(spark, d).cache()
    val nOrders = Tables.orders(spark, d).count()
    val pivoted = piv.agg(sum($"f_n" + $"o_n" + $"p_n")).head().getLong(0)
    assert(pivoted === nOrders,
      s"pivot cells must partition the corpus: $pivoted != $nOrders")
    // cross-check one cell against a direct filtered aggregate
    val direct = Tables.orders(spark, d)
      .filter($"o_orderstatus" === "O").count()
    val fromPivot = piv.agg(sum($"o_n")).head().getLong(0)
    assert(fromPivot === direct)
  }

  test("w_value_outliers: z-scores sum to ~0 per group and flags imply |z| > 3") {
    val out = EventWindows.qValueOutliers.run(spark, d).cache()
    assert(out.count() === Tables.events(spark, d).count(),
      "outlier report must cover every event")
    val badFlag = out.filter($"is_outlier" && abs($"z") <= 3.0).count()
    assert(badFlag === 0, "is_outlier must mean |z| > 3")
    // sum of (q - mean) over a group is exactly 0, so per-group z sums
    // only carry rounding residue: |mean z| < 1e-4 per group
    val drift = out.groupBy($"user_id", $"event_type")
      .agg(abs(avg($"z")).as("m")).filter($"m" > 1e-4).count()
    assert(drift === 0, "per-group z must center on 0")
  }

  test("dd_containment: dominates jaccard pairwise and classifies consistently") {
    val cont = graft.queries.Dedup.qContainment.run(spark, d).cache()
    val jac = graft.queries.Dedup.qVerifiedPairs.run(spark, d)
      .select($"doc_a", $"doc_b", $"jaccard")
    // |A∩B|/|A| >= |A∩B|/|A∪B| always (A ⊆ A∪B)
    val violations = cont.join(jac, Seq("doc_a", "doc_b"))
      .filter($"containment_a" < $"jaccard" - 1e-6 ||
              $"containment_b" < $"jaccard" - 1e-6)
      .count()
    assert(violations === 0, "containment must dominate jaccard on every pair")
    val misclass = cont.filter(
      ($"relation" === "mutual" &&
        ($"containment_a" < 0.9 || $"containment_b" < 0.9)) ||
      ($"relation" === "none" &&
        ($"containment_a" >= 0.9 || $"containment_b" >= 0.9))).count()
    assert(misclass === 0, "relation labels must match their thresholds")
  }

  test("sim_kmeans_cells: conservation, no collapse, training beats random") {
    import graft.functions.VectorExpressions
    val rep = graft.queries.Similarity.qKmeansCells.run(spark, d).cache()
    val nVecs = Tables.embeddings(spark, d).count()
    assert(rep.agg(sum($"n_vectors")).head().getLong(0) === nVecs,
      "every vector must land in exactly one cell")
    assert(rep.count() <= 8)
    val biggest = rep.agg(max($"n_vectors")).head().getLong(0)
    assert(biggest < nVecs, "training must not collapse to one cell")
    // training quality: mean within-cell cosine of the TRAINED
    // partition must beat a hash-random partition of the same data —
    // the weakest claim two Lloyd iterations must clear
    val e = Tables.embeddings(spark, d)
      .select($"vec_id", VectorExpressions.quantize($"embedding").as("q"))
    def meanCos(assign: org.apache.spark.sql.DataFrame): Double = {
      val sums = e.join(assign, "vec_id")
        .select($"cell", posexplode($"q").as(Seq("pos", "v")))
        .groupBy($"cell", $"pos").agg(sum($"v").as("sv"))
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"pos", $"sv"))),
          x => x("sv")).as("cv"))
      val cos = VectorExpressions.quantizedDot($"q", $"cv").cast("double") /
        (sqrt(VectorExpressions.quantizedDot($"q", $"q").cast("double")) *
         sqrt(VectorExpressions.quantizedDot($"cv", $"cv").cast("double")))
      e.join(assign, "vec_id").join(sums, "cell")
        .agg(avg(cos)).head().getDouble(0)
    }
    val trained = meanCos(graft.queries.Similarity.kmeansAssign(spark, d))
    val random = meanCos(
      e.select($"vec_id", pmod($"vec_id", lit(8)).cast("int").as("cell")))
    assert(trained > random,
      s"trained partition ($trained) must beat random ($random)")
  }

  test("q_approx_percentiles lands inside the exact rank-error envelope") {
    // rank error <= 1/accuracy = 1%; gate each sketch value between
    // the EXACT percentiles at p -/+ 2% (computed by the oracle-checked
    // exact machinery), per group
    val li = Tables.lineitem(spark, d)
    val envelope = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_quantity, 0.48)").as("lo50"),
      expr("percentile(l_quantity, 0.52)").as("hi50"),
      expr("percentile(l_quantity, 0.88)").as("lo90"),
      expr("percentile(l_quantity, 0.92)").as("hi90"),
      expr("percentile(l_quantity, 0.97)").as("lo99"),
      expr("percentile(l_quantity, 1.00)").as("hi99"))
    val bad = Relational.qApproxPercentiles.run(spark, d)
      .join(envelope, "l_returnflag")
      .filter($"ap50" < $"lo50" || $"ap50" > $"hi50" ||
              $"ap90" < $"lo90" || $"ap90" > $"hi90" ||
              $"ap99" < $"lo99" || $"ap99" > $"hi99")
      .count()
    assert(bad === 0, "every approx percentile must sit in its exact envelope")
  }

  test("variant props decode equals the JSON-string decode row for row") {
    val viaString = graft.queries.EventWindows.qJsonProps.run(spark, d)
    val viaVariant = graft.queries.EventWindows.qVariantProps.run(spark, d)
    assert(viaString.exceptAll(viaVariant).isEmpty &&
           viaVariant.exceptAll(viaString).isEmpty,
      "parse_json/variant_get must agree with get_json_object exactly")
  }

  test("t_idf_rarity: bounds and the all-common-token floor") {
    val docs = Tables.documents(spark, d)
    val n = docs.count()
    val r = TextAnalysis.qIdfRarity.run(spark, d).cache()
    assert(r.count() === n, "one rarity row per document")
    val maxIdf = (math.log(n.toDouble) * 1e6).toLong + 1
    val oob = r.filter($"mean_idf_micro" < 0L || $"mean_idf_micro" > maxIdf).count()
    assert(oob === 0, s"mean_idf_micro must lie in [0, 1e6·ln($n)]")
    // a token present in EVERY doc has idf exactly 0; a unique token
    // scores ln(N) — so the per-doc mean orders rare-heavy docs above
    // boilerplate. Verify the ordering signal exists in the fixture:
    val spread = r.agg(max($"mean_idf_micro") - min($"mean_idf_micro"))
      .head().getLong(0)
    assert(spread > 100000L, "fixture should separate rare-heavy from common-heavy docs")
  }

  test("w_gap_fill_hourly: dense spine, conservation, and carry-forward") {
    val g = EventWindows.qGapFill.run(spark, d).cache()
    val ev = Tables.events(spark, d)
    // dense spine: every type covers every hour between global min/max
    val nTypes = ev.select($"event_type").distinct().count()
    val hours = g.select($"w_start").distinct()
      .select(unix_timestamp($"w_start").as("s")).cache()
    val (mn, mx) = {
      val r = hours.agg(min($"s"), max($"s")).head(); (r.getLong(0), r.getLong(1))
    }
    assert(g.count() === ((mx - mn) / 3600 + 1) * nTypes,
      "spine must be |hours| x |types| with no holes")
    assert(hours.count() === (mx - mn) / 3600 + 1)
    // conservation: zero-filled counts still sum to the corpus
    assert(g.agg(sum($"n_events")).head().getLong(0) === ev.count())
    // gap semantics + carry-forward: on gap rows the filled value
    // equals the previous hour's filled value (and counts are 0)
    assert(g.filter($"is_gap" && $"n_events" =!= 0L).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"w_start")
    val broken = g
      .withColumn("prev", lag($"ffill_value", 1).over(w))
      .filter($"is_gap" && $"prev".isNotNull && $"ffill_value" =!= $"prev")
      .count()
    assert(broken === 0, "gap rows must carry the previous filled value")
  }

  test("w_mad_outliers: lower-median truth and the exact 4.4478-MAD cut") {
    val out = EventWindows.qMadOutliers.run(spark, d).cache()
    val ev = Tables.events(spark, d)
      .select($"event_type", floor($"value" * 1e4 + 0.5).cast("long").as("q"))
    assert(out.count() === ev.count(), "one verdict per event")
    // replay median/MAD per type in memory (sf0.001 is small enough)
    val byType = ev.collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(1)).sorted }
    def lowerMedian(xs: Array[Long]): Long = xs((xs.length - 1) / 2)
    val reported = out.select($"event_type", $"median", $"mad").distinct()
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    byType.foreach { case (t, xs) =>
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).sorted)
      assert(reported(t) === (med / 1e4, mad / 1e4),
        s"median/MAD for $t must equal the in-memory lower medians")
    }
    // direct cut check: recompute dv from the event values
    val joined = Tables.events(spark, d)
      .select($"event_id", $"event_type",
        floor($"value" * 1e4 + 0.5).cast("long").as("q"))
      .join(out, Seq("event_id", "event_type"))
    val wrongCut = joined.filter(
      (abs($"q" - ($"median" * 1e4).cast("long")) * 10000L >
        ($"mad" * 1e4).cast("long") * 44478L) =!= $"is_outlier").count()
    assert(wrongCut === 0, "flag must equal the exact integer MAD cut")
  }

  test("sim_cluster_quality: in-memory cohesion/separation replay matches") {
    val q = queries.Similarity.qClusterQuality.run(spark, d).cache()
    // replay from the same trained assignment and raw embeddings
    val assign = queries.Similarity.sessionCoarseAssign(spark, d)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, d)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 10000 + 0.5).toLong).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
      .toMap
    val cells = vecs.keys.filter(assign.contains)
      .groupBy(assign).map { case (c, ids) => c -> ids.toSeq.sorted }
    val cent = cells.map { case (c, ids) =>
      c -> ids.map(vecs).transpose.map(_.sum).toArray }
    def cosMicro(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      math.floor(dot / (na * nb) * 1e6 + 0.5).toLong
    }
    val got = q.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4),
        r.getBoolean(5))).toMap
    assert(got.keySet === cells.keySet)
    cells.foreach { case (c, ids) =>
      val n = ids.size.toLong
      val csum = ids.map(id => cosMicro(vecs(id), cent(c))).sum
      val mean = Math.floorDiv(csum + n * 1000000L, n) - 1000000L
      val (nnCell, nnCos) = cent.view.filterKeys(_ != c)
        .map { case (o, cv) => (o, cosMicro(cent(c), cv)) }
        .maxBy { case (o, p) => (p, -o) }
      assert(got(c) === ((n, mean, nnCell, nnCos, mean > nnCos)),
        s"cell $c must match the in-memory replay")
    }
  }

  test("w_event_transitions: in-memory Markov replay and share algebra") {
    val ev = Tables.events(spark, d)
      .select($"user_id", $"event_id",
        expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)").as("sec"),
        $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val n = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nFrom = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = n.map { case ((f, t), c) =>
      (f, t) -> (c, Math.floorDiv(c * 1000000L, nFrom(f))) }
    val got = queries.EventWindows.qEventTransitions.run(spark, d)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected, "engine must equal the in-memory Markov replay")
    // pair conservation: one pair per event beyond each user's first
    val users = ev.map(_._1).distinct.length
    assert(got.values.map(_._1).sum === ev.length - users)
    // floor shares per from-type sum to 1e6 minus < |to types| residue
    got.keys.map(_._1).toSeq.distinct.foreach { f =>
      val shares = got.filter(_._1._1 == f).values.map(_._2)
      assert(shares.sum <= 1000000L && shares.sum > 1000000L - shares.size)
    }
  }

  test("w_rfm_features: in-memory replay matches per user") {
    val ev = Tables.events(spark, d)
      .select($"user_id", expr("CAST(floor(unix_timestamp(ts)) AS BIGINT)"),
        floor($"value" * 1e4 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val now = ev.map(_._2).max
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val last = rows.map(_._2).max
      val freq = rows.size.toLong
      val mq = rows.map(_._3).sum
      val rec = Math.floorDiv(now - last, 86400L)
      u -> (rec, freq, mq / 1e4, rec <= 30,
        freq.toString.length, math.max(mq / 10000, 1L).toString.length)
    }
    val got = queries.EventWindows.qRfmFeatures.run(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getInt(5), r.getInt(6))).toMap
    assert(got === expected, "RFM table must equal the in-memory replay")
  }

  test("w_seasonal_hourofweek: shares partition each type, peaks follow counts") {
    val r = EventWindows.qSeasonal.run(spark, d).cache()
    val ev = Tables.events(spark, d)
    assert(r.agg(sum($"n_events")).head().getLong(0) === ev.count())
    assert(r.filter($"how" < 0L || $"how" > 167L).count() === 0)
    // per type: floor-share residue < #slots, and peak flag consistent
    r.groupBy($"event_type")
      .agg(sum($"share_micro").as("s"), count(lit(1)).as("k"))
      .collect().foreach { row =>
        val (s, k) = (row.getLong(1), row.getLong(2))
        assert(s <= 1000000L && s > 1000000L - k,
          s"floor shares must sum to 1e6 minus < $k of residue, got $s")
      }
    val totals = r.groupBy($"event_type").agg(sum($"n_events").as("tot"))
    val badPeak = r.join(totals, "event_type")
      .filter(($"n_events" * 168L > $"tot" * 2L) =!= $"is_peak").count()
    assert(badPeak === 0)
  }

  test("q_basket_pairs: hand-computed lift, support cut, in-order dup collapse") {
    // 6 baskets: five contain {A,B}, one contains {A,C}; basket 1
    // repeats part 10 (brand A) twice — the DISTINCT must collapse it.
    val li = (1 to 5).flatMap(o => Seq((o.toLong, 10L), (o.toLong, 20L))) ++
      Seq((1L, 10L), (6L, 10L), (6L, 30L))
    val pt = Seq((10L, "A"), (20L, "B"), (30L, "C"))
    val dir = java.nio.file.Files.createTempDirectory("basket").toString
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    pt.toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val rows = Relational.qBasketPairs.run(spark, dir).collect()
    // Only (A,B) reaches support 5; (A,C) has c_ab=1 and is cut.
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("brand_a") == "A" && r.getAs[String]("brand_b") == "B")
    assert(r.getAs[Long]("c_ab") == 5L, "dup part in basket 1 must not inflate c_ab")
    assert(r.getAs[Long]("c_a") == 6L && r.getAs[Long]("c_b") == 5L)
    // lift = ((5e6 div 6) * 6) div 5 = (833333*6) div 5 = 999999 ≈ 1.
    assert(r.getAs[Long]("lift_fp") == 999999L)
  }

  test("w_cumulative_users: conservation, monotonicity, first-seen identity") {
    val rows = EventWindows.qCumulativeUsers.run(spark, d)
      .orderBy($"day").collect()
    val users = Tables.events(spark, d).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == users)
    assert(rows.last.getAs[Long]("cum_users") == users)
    rows.foldLeft(0L) { (acc, r) =>
      val cum = r.getAs[Long]("cum_users")
      assert(cum == acc + r.getAs[Long]("new_users"),
        "cumulative must be the running sum of new users")
      cum
    }
  }

  test("w_interarrival_hist: hand-built gaps land in the right power-of-4 bands") {
    // One user, events at secs 0,0,1,4,8,23,87,1111 → consecutive gaps
    // 0,1,3,4,15,64,1024 → buckets 0,1,1,2,2,4,6 (band b = number of
    // base-4 digits, covering [4^(b-1), 4^b-1]).
    val secs = Seq(0L, 0L, 1L, 4L, 8L, 23L, 87L, 1111L)
    val dir = java.nio.file.Files.createTempDirectory("iah").toString
    secs.zipWithIndex.map { case (sec, i) => (i.toLong, sec) }
      .toDF("event_id", "sec")
      .select($"event_id", timestamp_seconds($"sec").cast("timestamp").as("ts"),
        lit(7L).as("user_id"), lit("x").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventWindows.qInterarrivalHist.run(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("gap_lo_sec"), r.getAs[Long]("n_gaps"))).toMap
    assert(got == Map(0L -> (0L, 1L), 1L -> (1L, 2L), 2L -> (4L, 2L),
      4L -> (64L, 1L), 6L -> (1024L, 1L)))
    // Conservation on the fixture corpus: each user contributes
    // (events - 1) gaps.
    val nEvents = Tables.events(spark, d).count()
    val nUsers = Tables.events(spark, d).select($"user_id").distinct().count()
    val totalGaps = EventWindows.qInterarrivalHist.run(spark, d)
      .agg(sum($"n_gaps")).head().getLong(0)
    assert(totalGaps == nEvents - nUsers)
  }
}
