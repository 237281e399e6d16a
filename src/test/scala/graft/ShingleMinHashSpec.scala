package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleMinHash

/** The native ShingleMinHash expression: parity with an independent
  * reference implementation, tokenization edges, codegen
  * participation, and SQL registration. */
class ShingleMinHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent (deliberately naive) reference: materialize shingle
    * strings, hash each, take permutation minima. */
  private def refSignature(text: String): Seq[Long] = {
    import ShingleMinHash.{A, B, M, P, Seed}
    def poly(s: String): Long =
      s.codePoints().toArray.foldLeft(Seed)((h, c) => (h * M + c) % P)
    // SQL-trim semantics (strip spaces only, keep trailing empties) —
    // the Tokenize contract, independently restated: NOT Java trim/split
    val toks = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      .split("\\s+", -1).toSeq
    val shingles =
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    (0 until 8).map { i =>
      shingles.map(sh => (poly(sh) * A(i) + B(i)) % P).min
    }
  }

  test("native signature == naive reference on the documents fixture") {
    val rows = Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text", ShingleMinHash.of($"text").as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Long](2)
      val want = refSignature(r.getString(1))
      assert(got == want, s"doc ${r.getLong(0)}")
    }
  }

  test("tokenization edges: empty, single token, two tokens, multi-space") {
    val cases = Seq("", "   ", "one", "one two", "a  b   c", "a b c d",
      "a b c\n", "\ta b c", " \t x y z \n ")
    val got = cases.toDF("text")
      .select(ShingleMinHash.of($"text").as("sig"))
      .collect().map(_.getSeq[Long](0))
    got.zip(cases).foreach { case (sig, text) =>
      assert(sig == refSignature(text), s"text '$text'")
      assert(sig.forall(v => v >= 0 && v < ShingleMinHash.P))
    }
    // multi-space normalizes: "a  b   c" ≡ "a b c"
    assert(got(4) == refSignature("a b c"))
  }

  test("codegen: signature project stays inside whole-stage codegen") {
    val dir = java.nio.file.Files.createTempDirectory("smh").toString + "/d"
    Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(ShingleMinHash.of($"text").as("sig"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [shingle_minhash"), s"plan was:\n$plan")
  }

  test("shingle_hashes: sorted-distinct set, consistent with the signature") {
    import ShingleMinHash.{A, B, P}
    import org.apache.spark.sql.graft.ShingleHashes
    val rows = Tables.documents(spark, sf("sf0.001"))
      .select($"text", ShingleHashes.of($"text").as("hs"),
        ShingleMinHash.of($"text").as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getSeq[Long](1)
      // canonical form: strictly increasing (sorted + distinct)
      assert(hs.zip(hs.drop(1)).forall { case (a, b) => a < b })
      // the MinHash signature is derivable from the hash set: dupes
      // never move a minimum, so min over permuted set == signature
      val sig = r.getSeq[Long](2)
      (0 until 8).foreach { i =>
        assert(hs.map(v => (v * A(i) + B(i)) % P).min == sig(i))
      }
    }
    // codegen + SQL surface
    val plan = Tables.documents(spark, sf("sf0.001"))
      .select(ShingleHashes.of($"text").as("hs"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("shingle_hashes"), plan)
    GraftExtensions.register(spark)
    // "x y z x y z" has 4 shingles, of which "x y z" repeats → 3 distinct
    assert(spark.sql("SELECT shingle_hashes('x y z x y z') AS h")
      .collect().head.getSeq[Long](0).size == 3)
  }

  test("SQL registration via extensions") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT shingle_minhash('x y z') AS sig")
      .collect().head.getSeq[Long](0)
    assert(got == refSignature("x y z"))
    // null text → null signature
    assert(spark.sql("SELECT shingle_minhash(CAST(NULL AS STRING))")
      .collect().head.isNullAt(0))
  }
}
