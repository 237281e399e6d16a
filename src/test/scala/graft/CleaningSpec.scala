package graft

import graft.functions.Cleaning._
import org.apache.spark.sql.functions._
/** E1–E18 semantics pinned against the reference's Python behavior
  * (citations in graft.functions.Cleaning). */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: java.lang.String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Option(in)).toDF("v").select(c(col("v"))).as[String].head()

  test("E1 phone: 10 digits → +1 prefix") {
    assert(one("(801) 555-1234", normalizePhone) == "+18015551234")
  }
  test("E1 phone: 11 digits starting with 1 → + prefix") {
    assert(one("1-801-555-1234", normalizePhone) == "+18015551234")
  }
  test("E1 phone: malformed passes through; null → empty") {
    assert(one("12345", normalizePhone) == "12345")
    assert(one(null, normalizePhone) == "")
  }
  test("E1 phone property: any 10-digit input is +1-prefixed (100 seeds)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(100)(Seq.fill(10)(rnd.nextInt(10)).mkString)
    val got = samples.map(d => s"($d").toDF("v")
      .select(normalizePhone(col("v"))).as[String].collect()
    assert(got.toSeq == samples.map("+1" + _))
  }

  test("E2 capitalize matches Python str.capitalize per word") {
    assert(one("john MCALLISTER smith", capitalizeWords) == "John Mcallister Smith")
  }

  test("E3 price parse with sentinel") {
    assert(Seq("$1,234,567").toDF("v").select(parsePrice(col("v"))).as[Long].head() == 1234567L)
    assert(Seq("garbage").toDF("v").select(parsePrice(col("v"))).as[Long].head() == 0L)
  }

  test("E4 address round-trip") {
    val addr = "123 S Main St, Provo, UT 84601"
    assert(one(addr, addressCity) == "Provo")
    assert(one(addr, addressState) == "UT")
    assert(one(addr, addressZip) == "84601")
  }

  test("E5 name split: multi-word last name") {
    assert(one("Mary Jo Van Der Berg", firstName) == "Mary")
    assert(one("Mary Jo Van Der Berg", lastName) == "Jo Van Der Berg")
    assert(one("Cher", lastName) == "")
  }

  test("E6 positional sqft slice: bug-for-bug int(stats[-12:-8])") {
    // "1850 sqft/ac" are the last 12 chars → slice = "1850"
    val hit = Seq("3bd 2ba 1850 sqft/ac").toDF("v")
      .select(sqftSlice(col("v"))).as[Long].head()
    assert(hit == 1850L)
    // non-numeric slice and short strings → 0 (the except path)
    for (bad <- Seq("some random description", "short", "", "exactly12chr")) {
      assert(Seq(bad).toDF("v").select(sqftSlice(col("v"))).as[Long].head() == 0L)
    }
    // surrounding spaces tolerated like Python int(' 850')
    val padded = Seq("xx 850 sqft/ac").toDF("v") // slice = " 850"
      .select(sqftSlice(col("v"))).as[Long].head()
    assert(padded == 850L)
  }

  test("E6 column twin agrees with the parser's Scala slice") {
    import graft.sources.HtmlListingParser.sqftFromStats
    val cases = Seq("3bd 2ba 1850 sqft/ac", "short", "", "abc defg hijk lmn",
      "xx 850 sqft/ac", "ends 2100 sqft abc") // varied lengths
    val cols = cases.toDF("v").select(sqftSlice(col("v"))).as[Long].collect()
    assert(cols.toSeq == cases.map(sqftFromStats))
  }

  test("E7 guarded division") {
    val r = Seq((10L, 0L), (10L, 4L)).toDF("p", "s")
      .select(guardedDiv(col("p"), col("s"))).as[Double].collect()
    assert(r.toSeq == Seq(0.0, 2.5))
  }

  test("E12 tag list") {
    assert(one("Provo,Orem , Lehi", c => tagList(c, " Utah Market")) ==
      "Provo Utah Market, Orem Utah Market, Lehi Utah Market")
  }

  test("E16 last-token extraction (Days on URE)") {
    assert(one("Days on URE 17", lastToken) == "17")
    assert(one("  single  ", lastToken) == "single")
  }

  test("E17 whitespace: single-pass double-space collapse (Python parity)") {
    // Python '   a    b'.replace('  ',' ') → ' a  b' (single pass!)
    assert(one("   a    b", cleanWhitespace) == "a  b")
  }
}
