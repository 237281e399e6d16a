package graft

import graft.sources.HtmlListingParser

/** S2/S5/S6 extractor semantics over fixture HTML covering the
  * sentinel fallbacks and row-drop behavior (FIXTURES.md B). */
class HtmlParserSpec extends SparkSpec {
  import spark.implicits._

  private def ureBlock(mls: String, price: String, addr: String,
      agent: String = "Jane Doe", phone: String = "(801) 555-0001",
      sqft: String = "2000"): String =
    s"""<table class="public-detail-quickview">
       |<span class="mls">$mls</span><span class="price">$price</span>
       |<span class="address">$addr</span>
       |<span class="agent-name">$agent</span>
       |<span class="agent-phone">$phone</span>
       |<span class="sqft">$sqft</span>
       |<span class="broker-name">Acme Realty</span>
       |</table>""".stripMargin

  test("S2: URE page with two listings parses both, fields extracted") {
    val html = ureBlock("123", "$500,000", "1 Main St, Provo, UT 84601") +
      ureBlock("456", "$1,250,000", "2 Oak Ave, Orem, UT 84058")
    val rows = HtmlListingParser.parseUre(html)
    assert(rows.map(_.mls) == Seq("123", "456"))
    val first = rows.head
    assert(first.price == 500000L)
    assert(first.city.contains("Provo"))
    assert(first.state.contains("UT"))
    assert(first.zip.contains("84601"))
    assert(first.sqft == 2000L)
    assert(first.ppsqft == 250.0)
    assert(first.agent_first_name.contains("Jane"))
    assert(first.broker_name.contains("Acme Realty"))
    assert(first.source == "URE")
  }

  test("S2: sentinel fallbacks — missing price/sqft → 0, no crash") {
    val html = """<table class="public-detail-quickview">
      <span class="mls">789</span></table>"""
    val rows = HtmlListingParser.parseUre(html)
    assert(rows.length == 1)
    assert(rows.head.price == 0L)
    assert(rows.head.sqft == 0L)
    assert(rows.head.ppsqft == 0.0) // guarded division (E7)
    assert(rows.head.city.isEmpty)
  }

  test("S2: block without mls is dropped; page with none yields empty") {
    assert(HtmlListingParser.parseUre("<html>nothing here</html>").isEmpty)
  }

  test("S5: Trulia link extraction prefixes domain") {
    val html = """<a data-testid="property-card-link" href="/p/1">x</a>
                  <a data-testid="property-card-link" href="/p/2">y</a>"""
    assert(HtmlListingParser.parseTruliaUrls(html) ==
      Seq("https://www.trulia.com/p/1", "https://www.trulia.com/p/2"))
  }

  test("S6: Trulia detail parses beds/baths/sqft from feature string (E15)") {
    val html = """<span class="mls">T1</span><span class="price">$350,000</span>
      <span class="features">3 Beds • 2.5 Baths • 1800 sqft</span>
      <span class="city">Provo</span>"""
    val l = HtmlListingParser.parseTruliaDetail(html).get
    assert(l.beds.contains(3L))
    assert(l.baths.contains(2.0)) // integer regex, matches reference int parse
    assert(l.sqft == 1800L)
    assert(l.source == "TRULIA")
  }

  test("S6: page without mls drops the row (trulia_scraper.py:114-119)") {
    assert(HtmlListingParser.parseTruliaDetail("<html>broken</html>").isEmpty)
  }

  test("S6: co-agent name/phone split on ',' (trulia_scraper.py:95-99)") {
    val html = """<span class="mls">T2</span><span class="price">$200,000</span>
      <span class="co-agent">Co-Agent: Jane Roe, (205) 555-0009</span>"""
    val l = HtmlListingParser.parseTruliaDetail(html).get
    assert(l.co_agent_name.contains("Jane Roe"))
    assert(l.co_agent_phone.contains("(205) 555-0009"))
    // phone absent → parts[1] missing → None (reference: '' sentinel)
    val noPhone = """<span class="mls">T3</span>
      <span class="co-agent">Co-Agent: Solo Agent</span>"""
    val l2 = HtmlListingParser.parseTruliaDetail(noPhone).get
    assert(l2.co_agent_name.contains("Solo Agent"))
    assert(l2.co_agent_phone.isEmpty)
    // sibling without the Co-Agent marker is ignored (:96 guard)
    val marker = """<span class="mls">T4</span>
      <span class="co-agent">Unrelated sibling text</span>"""
    assert(HtmlListingParser.parseTruliaDetail(marker).get.co_agent_name.isEmpty)
  }

  test("S3: parseUreFacts extracts days_on_ure/type/style (ure_scraping.py:211-253)") {
    val html =
      """<div class="facts___item"><span class="facts-header">Days on URE</span><div>Days on URE 17</div></div>
        |<div class="facts___item"><span class="facts-header">Type</span><div>Type Condo</div></div>
        |<div class="facts___item"><span class="facts-header">Style</span><div>Style Two Story</div></div>
        |<div class="facts___item"><span class="facts-header">Other</span><div>ignored</div></div>"""
        .stripMargin
    val f = HtmlListingParser.parseUreFacts(html)
    assert(f.daysOnUre.contains("17")) // E16: last token only
    assert(f.listingType.contains("Condo"))
    assert(f.style.contains("Two Story"))
    assert(HtmlListingParser.parseUreFacts("<html/>") ==
      HtmlListingParser.UreFacts(None, None, None))
  }

  test("E6: sqft falls back to the positional stats slice when no sqft span") {
    val html = """<table class="public-detail-quickview">
      <span class="mls">S1</span><span class="price">$370,000</span>
      <span class="stats">3bd 2ba 1850 sqft/ac</span></table>"""
    val rows = HtmlListingParser.parseUre(html)
    assert(rows.head.sqft == 1850L) // [-12:-8] = "1850"
    assert(rows.head.stats.contains("3bd 2ba 1850 sqft/ac"))
    assert(rows.head.ppsqft == 370000.0 / 1850)
    // slice failure → 0 sentinel, division guarded (E7)
    val bad = HtmlListingParser.parseUre(
      html.replace("3bd 2ba 1850 sqft/ac", "no numbers here at all"))
    assert(bad.head.sqft == 0L && bad.head.ppsqft == 0.0)
  }

  test("UDTF shape: parser runs distributed via flatMap") {
    val pages = Seq(
      ureBlock("A1", "$100,000", "1 A St, Provo, UT 84601"),
      ureBlock("A2", "$200,000", "2 B St, Orem, UT 84058"))
    val ds = pages.toDS().repartition(2)
      .flatMap(HtmlListingParser.parseUre)
    assert(ds.count() == 2)
    assert(ds.map(_.mls).collect().sorted.toSeq == Seq("A1", "A2"))
  }
}
