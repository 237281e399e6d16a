package graft

import graft.sources.PaginatedHttpSource

/** S1/F7 — the paginated scan's termination contract, exercised with a
  * fixture transport (zero egress): the per-zip page loop must stop at
  * the first empty page or fetch error and NEVER touch a page past the
  * stop (ure_scraping.py:23-47). */
object PaginationFixture {
  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)

  private def block(mls: String) =
    s"""<table class="public-detail-quickview"><span class="mls">$mls</span>
       |<span class="price">$$100,000</span></table>""".stripMargin

  private def param(url: String, key: String): String =
    url.split(key + "=")(1).split("&")(0)

  /** 2 listing pages per zip, page 3 empty; fetching page 4 is an F7
    * violation. Zip 99999 errors immediately (the RequestException
    * break path). Local mode shares the JVM, so the counter sees
    * executor-side calls. */
  val fetch: String => Option[String] = url => {
    fetches.incrementAndGet()
    val zip = param(url, "zip")
    val page = param(url, "page").toInt
    if (zip == "99999") None
    else if (page <= 2) Some(block(s"$zip-P$page"))
    else if (page == 3) Some("<html>no listings</html>")
    else throw new IllegalStateException(s"F7 violated: fetched page $page")
  }
}

class PaginationSpec extends SparkSpec {
  import spark.implicits._

  private val template =
    "http://base/search?zip=%s&maxPrice=%d&minSqFt=%d&minLot=%s&page=%d"

  test("F7: pagination stops at first empty page, one partition per zip") {
    PaginationFixture.fetches.set(0)
    val src = new PaginatedHttpSource(template, 15000000L, 750L, 0.01,
      PaginationFixture.fetch)
    val ds = src.scan(spark, Seq("84601", "84058"))
    assert(ds.rdd.getNumPartitions == 2) // partition-per-zip layout
    val got = ds.collect().map(_.mls).sorted.toSeq
    assert(got == Seq("84058-P1", "84058-P2", "84601-P1", "84601-P2"))
    // 3 fetches per zip (two listing pages + the empty page), never 4
    assert(PaginationFixture.fetches.get() == 6)
  }

  test("F7: fetch error breaks the loop like RequestException (:31-34)") {
    val src = new PaginatedHttpSource(template, 15000000L, 750L, 0.01,
      PaginationFixture.fetch)
    assert(src.scan(spark, Seq("99999")).isEmpty)
  }

  test("E14: server-side predicates are encoded in the page URL (F1 pushdown)") {
    val src = new PaginatedHttpSource(template, 15000000L, 750L, 0.01,
      PaginationFixture.fetch)
    val url = src.pageUrl("84601", 7)
    assert(url ==
      "http://base/search?zip=84601&maxPrice=15000000&minSqFt=750&minLot=0.01&page=7")
  }

  test("E14: detail url template, mls substituted twice (ure_scraping.py:211)") {
    import graft.functions.Cleaning
    import org.apache.spark.sql.functions.col
    val got = Seq("1996489").toDF("mls")
      .select(Cleaning.detailUrl(col("mls"))).as[String].head()
    assert(got == "http://www.utahrealestate.com/report/public.single.report/report/detailed/listno/1996489/scroll_to/1996489")
    // the parser falls back to the same template when no url span
    val rows = graft.sources.HtmlListingParser.parseUre(
      """<table class="public-detail-quickview"><span class="mls">1996489</span></table>""")
    assert(rows.head.url.contains(got))
  }
}
