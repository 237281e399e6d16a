package graft

import graft.functions.Cleaning
import graft.model.Listing
import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** SURVEY §5 item 3 — the promised ScalaCheck property tests.
  *
  * Each trial evaluates a whole generated BATCH through a real Spark
  * plan (one local job per trial, not per sample), so the properties
  * exercise the exact codegen'd column expressions that production
  * queries use, at ScalaCheck breadth without per-row job overhead.
  *
  * Seeded: failures reproduce deterministically.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, trials: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(trials)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  // --- E1 phone normalizer (data_loader.py:16-24) ---------------------

  private val tenDigits: Gen[String] =
    Gen.listOfN(10, Gen.numChar).map(_.mkString)
  private val elevenWithOne: Gen[String] =
    Gen.listOfN(10, Gen.numChar).map("1" + _.mkString)
  /** Digits with reference-realistic formatting noise interleaved. */
  private def noisy(digits: String): Gen[String] =
    Gen.listOfN(digits.length + 1, Gen.oneOf("", "", "-", " ", ".", "(", ")"))
      .map { seps =>
        seps.head + digits.zip(seps.tail).map { case (d, s) => s"$d$s" }.mkString
      }

  test("E1 property: any noisy 10-digit input normalizes to +1 + digits") {
    val gen = for {
      d <- tenDigits
      n <- noisy(d)
    } yield (n, "+1" + d)
    check(Prop.forAll(Gen.listOfN(50, gen)) { cases =>
      val got = cases.toDF("raw", "expected")
        .select(Cleaning.normalizePhone(col("raw")), col("expected"))
        .collect()
      got.forall(r => r.getString(0) == r.getString(1))
    }, trials = 15)
  }

  test("E1 property: noisy 11-digit-leading-1 input normalizes to + + digits") {
    val gen = for {
      d <- elevenWithOne
      n <- noisy(d)
    } yield (n, "+" + d)
    check(Prop.forAll(Gen.listOfN(50, gen)) { cases =>
      val got = cases.toDF("raw", "expected")
        .select(Cleaning.normalizePhone(col("raw")), col("expected"))
        .collect()
      got.forall(r => r.getString(0) == r.getString(1))
    }, trials = 15)
  }

  test("E1 property: normalization is idempotent and off-shape inputs pass through") {
    // Off-shape: digit count not 10, and not 11-leading-1 — reference
    // returns the raw string untouched (data_loader.py:23).
    val offShape = Gen.oneOf(
      Gen.listOfN(7, Gen.numChar).map(_.mkString),
      Gen.listOfN(12, Gen.numChar).map(_.mkString),
      Gen.listOfN(10, Gen.numChar).map("2" + _.mkString), // 11 digits, no leading 1
      Gen.alphaStr.suchThat(_.forall(!_.isDigit)))
    val anyPhone = Gen.oneOf(
      tenDigits.flatMap(noisy), elevenWithOne.flatMap(noisy), offShape)
    check(Prop.forAll(Gen.listOfN(50, anyPhone), Gen.listOfN(50, offShape)) {
      (any, off) =>
        val once = any.toDF("raw")
          .select(Cleaning.normalizePhone(col("raw")).as("n1"))
        val twice = once
          .select(col("n1"), Cleaning.normalizePhone(col("n1")).as("n2"))
          .collect()
        val passedThrough = off.toDF("raw")
          .select(col("raw"), Cleaning.normalizePhone(col("raw")))
          .collect()
        twice.forall(r => r.getString(0) == r.getString(1)) &&
          passedThrough.forall(r => r.getString(1) == r.getString(0))
    }, trials = 10)
  }

  // --- E4 address decompose round-trip (ure_scraping.py:171-189) ------

  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))

  test("E4 property: 'street, city, ST zip' round-trips city/state/zip") {
    val gen = for {
      street <- Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, word).map(_.mkString(" ")))
      city <- Gen.choose(1, 2).flatMap(n =>
        Gen.listOfN(n, word).map(_.mkString(" ")))
      st <- Gen.listOfN(2, Gen.alphaUpperChar).map(_.mkString)
      zip <- Gen.listOfN(5, Gen.numChar).map(_.mkString)
    } yield (s"$street, $city, $st $zip", city, st, zip)
    check(Prop.forAll(Gen.listOfN(50, gen)) { cases =>
      val got = cases.toDF("addr", "city", "st", "zip")
        .select(
          Cleaning.addressCity(col("addr")) === col("city"),
          Cleaning.addressState(col("addr")) === col("st"),
          Cleaning.addressZip(col("addr")) === col("zip"))
        .collect()
      got.forall(r => r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    }, trials = 15)
  }

  // --- CDC batch invariants (main.py:14-37, hunter.py:336-354) --------

  /** Key space deliberately small so prev/cur overlap is common. */
  private val listingsGen: Gen[Seq[Listing]] =
    Gen.mapOf(Gen.zip(
      Gen.choose(0, 25).map(i => f"MLS$i%03d"),
      Gen.choose(0L, 2000000L)))
      .map(_.toSeq.map { case (mls, price) => Listing.minimal(mls, price) })

  test("CDC property: event partition matches the key-set algebra") {
    check(Prop.forAll(listingsGen, listingsGen) { (prevL, curL) =>
      val prev = spark.createDataset(prevL)
      val cur = spark.createDataset(curL)
      val events = Cdc.batchEvents(prev, cur, nowEpoch = 1700000000L).collect()
      val pk = prevL.map(l => l.mls -> l.price).toMap
      val ck = curL.map(l => l.mls -> l.price).toMap
      val newKeys = ck.keySet -- pk.keySet
      val goneKeys = pk.keySet -- ck.keySet
      val changedKeys = (pk.keySet & ck.keySet).filter(k => pk(k) != ck(k))
      val byType: Map[String, Set[String]] = events.groupBy(_.status)
        .map { case (t, es) => t -> es.map(_.mls).toSet }
      byType.getOrElse("new_listing", Set.empty) == newKeys &&
        byType.getOrElse("off_market", Set.empty) == goneKeys &&
        byType.getOrElse("price_change", Set.empty) == changedKeys &&
        events.length == newKeys.size + goneKeys.size + changedKeys.size &&
        events.length <= pk.size + ck.size
    }, trials = 8)
  }

  test("CDC property: re-processing an identical batch emits zero events") {
    check(Prop.forAll(listingsGen) { curL =>
      val cur = spark.createDataset(curL)
      Cdc.batchEvents(cur, cur, nowEpoch = 1700000000L).isEmpty
    }, trials = 8)
  }

  // --- round-8 fixed-point text scores --------------------------------

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val docGen: Gen[Seq[String]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, wordGen))
  private val corpusGen: Gen[Seq[Seq[String]]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, docGen))

  private def entropyOn(texts: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("prop_ent").toString
    texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    queries.TextAnalysis.qTokenEntropy.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
  }

  test("entropy property: invariant under token permutation, bounded by ln") {
    check(Prop.forAll(corpusGen) { corpus =>
      val base = corpus.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) }
      val perm = corpus.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.reverse.mkString(" ")) }
      val h1 = entropyOn(base)
      val h2 = entropyOn(perm)
      val bagInvariant = h1 == h2
      val bounded = corpus.zipWithIndex.forall { case (ws, i) =>
        val h = h1(i.toLong)
        h >= -2L &&
          h <= math.floor(math.log(ws.distinct.length.toDouble) * 1e6) + 2
      }
      bagInvariant && bounded
    }, trials = 6)
  }

  test("DSIR property: doc scores are additive over the bucket-count split") {
    // the per-doc weight is a SUM over bucket counts, so splitting any
    // doc's tokens into two docs (same lang) and re-scoring with the
    // SAME trained lr table must give w(doc) = w(partA) + w(partB)
    check(Prop.forAll(corpusGen.suchThat(_.head.length >= 2)) { corpus =>
      val docs = corpus.zipWithIndex.map { case (ws, i) =>
        (i.toLong, if (i % 2 == 0) "en" else "xx", ws.mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      val idx = streaming.StreamingDsir.buildIndex(docs)
      val (a, b) = corpus.head.splitAt(corpus.head.length / 2)
      val probe = Seq((100L, corpus.head.mkString(" ")),
        (101L, a.mkString(" ")), (102L, b.mkString(" ")))
        .toDF("doc_id", "text")
      val w = streaming.StreamingDsir.scoreBatch(probe, idx)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      w(100L) == w(101L) + w(102L)
    }, trials = 6)
  }
}
