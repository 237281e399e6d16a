package graft

import graft.operators.HammingBands
import graft.queries.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BlockHash60
import org.apache.spark.unsafe.types.UTF8String

/** Gates for the perceptual-hash near-dup operator, mirroring
  * AnnRecallSpec's contract for the embedding path: the native sketch
  * matches an independent reference, a light edit stays within the
  * Hamming radius of its original while unrelated payloads do not,
  * banding recall is exactly 1 at θ = nBands − 1, and the per-bucket
  * cap bounds a degenerate all-identical corpus. */
class MultimodalPhashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent (deliberately naive) block-mean hash: collections
    * code instead of the expression's single pass. */
  private def refHash(text: String): Long = {
    val cps = text.codePoints().toArray
    val n = cps.length.toLong
    if (n == 0) return 0L
    val byBlock = cps.zipWithIndex
      .groupBy { case (_, j) => ((j.toLong * 60L) / n).toInt }
    val q = (0 until 60).map { w =>
      byBlock.get(w) match {
        case Some(xs) => xs.map(_._1.toLong).sum * 1000L / xs.length
        case None => 0L
      }
    }
    val med = q.sorted.apply(29)
    (0 until 60).filter(i => q(i) > med).map(1L << _).sum
  }

  test("native blockhash == naive reference on fixture docs and edges") {
    val fixture = Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text").collect()
    assert(fixture.nonEmpty)
    fixture.foreach { r =>
      assert(BlockHash60.compute(UTF8String.fromString(r.getString(1))) ==
        refHash(r.getString(1)), s"doc ${r.getLong(0)}")
    }
    val edges = Seq("", "x", "ab", "你好世界", "a" * 59, "b" * 60, "c" * 61,
      "the quick brown fox " * 40, " \t pad \n ")
    edges.foreach { t =>
      assert(BlockHash60.compute(UTF8String.fromString(t)) == refHash(t),
        s"edge '${t.take(20)}'")
    }
    assert(BlockHash60.compute(UTF8String.fromString("")) == 0L)
    // constant payload: every block mean equals the median, no bit set
    assert(BlockHash60.compute(UTF8String.fromString("a" * 600)) == 0L)
  }

  test("perceptual property: light edit stays close, unrelated stays far") {
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val edited = base.replace("tok60", "tok61") // one small local change
    val unrelated = (1 to 120).map(i => s"zzz${i * 7919}").mkString(" ")
    def h(s: String) = BlockHash60.compute(UTF8String.fromString(s))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(base), h(edited)) <= 3,
      "a local edit must flip at most a few perceptual bits")
    assert(ham(h(base), h(unrelated)) > 10,
      "unrelated payloads must be far in Hamming space")
  }

  test("banding recall is exactly 1 at theta=3 (pigeonhole, cap slack)") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val sketches = docs.select($"doc_id", BlockHash60.of($"text").as("sh"))
    val banded = HammingBands
      .nearDupPairs(sketches, nBands = 4, bandBits = 15,
        cap = Int.MaxValue, theta = 3)
      .filter($"is_dup")
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all sketch pairs
    val all = sketches.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- all; (idb, sb) <- all
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs must equal brute-force ${brute.size}")
  }

  test("per-bucket cap bounds the degenerate all-identical corpus") {
    val cap = 8
    val n = 500 // every payload identical → one bucket per band
    val clones = spark.range(n)
      .select($"id".as("doc_id"), lit("same payload every time").as("text"))
    val pairs = HammingBands.nearDupPairs(
      clones.select($"doc_id", BlockHash60.of($"text").as("sh")),
      nBands = 4, bandBits = 15, cap = cap, theta = 3)
    val got = pairs.count()
    val bound = cap.toLong * (cap - 1) / 2 // ≤ cap² shape, exact here
    assert(got == bound,
      s"cap $cap must bound a $n-clone corpus to $bound pairs, got $got")
    // deterministic survivors: lowest doc_ids
    val ids = pairs.select($"doc_a").union(pairs.select($"doc_b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids == (0L until cap.toLong).toSet,
      "cap survivors must be the lowest doc_ids")
  }

  test("mm_phash_keep_list: keeper kept, dup_of resolves in one hop, conservation") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Multimodal.qPhashKeepList.run(spark, sf("sf0.001")).collect()
    assert(out.length == docs.count(), "one verdict per asset")
    val byId = out.map(r => r.getLong(0) ->
      (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    byId.foreach { case (id, (keep, dupOf)) =>
      if (keep) assert(dupOf.isEmpty, s"kept asset $id must carry no dup_of")
      else {
        val target = dupOf.getOrElse(fail(s"dropped $id needs dup_of"))
        assert(target < id, "keeper is the cluster min, so always lower")
        assert(byId(target)._1, s"dup_of of $id must resolve to a KEPT asset")
      }
    }
    // every verified dup pair ends up in one cluster: both sides keep
    // consistent verdicts (at most one of the two is kept... unless
    // they belong to the same cluster via a third asset)
    val dupPairs = Multimodal.qPhashNearDup.run(spark, sf("sf0.001"))
      .filter($"is_dup").select($"doc_a", $"doc_b").collect()
    dupPairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      def keeperOf(x: Long) = if (byId(x)._1) x else byId(x)._2.get
      assert(keeperOf(a) == keeperOf(b),
        s"dup pair ($a,$b) must share a cluster keeper")
    }
  }

  test("mm_phash_neardup runs end-to-end with verified hamming") {
    val out = Multimodal.qPhashNearDup.run(spark, sf("sf0.001"))
    // the sketch projection is native codegen, not an interpreted HOF
    val sketchPlan = Tables.documents(spark, sf("sf0.001"))
      .select(BlockHash60.of($"text").as("sh"))
      .queryExecution.executedPlan.toString
    assert(sketchPlan.contains("blockhash60"), sketchPlan)
    val rows = out.collect()
    rows.foreach { r =>
      val h = r.getInt(2)
      assert(h >= 0 && h <= 60)
      assert(r.getBoolean(3) == (h <= 3))
    }
  }

  test("mm_scene_keyframes: detector recovers the stub scene structure blind") {
    val d = sf("sf0.001")
    val rows = Multimodal.qSceneKeyframes.run(spark, d)
      .join(Tables.documents(spark, d)
        .select($"doc_id", ($"n_chars" % 30 + 1).cast("int").as("n_frames"),
          ($"n_chars" % 5 + 3).cast("int").as("s")), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    // one row per (asset, frame) of the shared stub geometry
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("frame_idx")).sorted.toSeq ==
        (0 until rs.head.getAs[Int]("n_frames")))
    }
    rows.foreach { r =>
      val (i, s) = (r.getAs[Int]("frame_idx"), r.getAs[Int]("s"))
      // the detector never sees s, yet must recover exactly the
      // frame_idx % s == 0 boundaries and number scenes as i div s
      assert(r.getAs[Boolean]("is_keyframe") == (i % s == 0),
        s"frame $i of scene length $s misclassified")
      assert(r.getAs[Long]("scene_id") == i / s)
      if (i == 0) assert(r.isNullAt(r.fieldIndex("hamming_prev")))
      else if (i % s == 0)
        assert(r.getAs[Int]("hamming_prev") > 5, "boundary jump")
      else assert(r.getAs[Int]("hamming_prev") <= 2, "within-scene wobble")
    }
  }
}
