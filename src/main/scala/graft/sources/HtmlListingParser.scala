package graft.sources

import graft.model.Listing
import scala.util.matching.Regex

/** S2/S5/S6 — HTML → rows extractors (SURVEY §2.1), the UDTF-shaped
  * operators: one raw-HTML string in, 0..n Listing rows out. Used via
  * `Dataset[String].flatMap(HtmlListingParser.parseUre)` so extraction
  * runs distributed, one task per fetched page partition.
  *
  * The reference walks a BeautifulSoup DOM
  * (/root/reference/ure_scraping.py:54-257, trulia_scraper.py:29-119);
  * here the same fields come out of the fixture HTML with anchored
  * regexes — the operator contract (schema, sentinel tolerance,
  * row-drop on failure) is what matters, not the DOM library.
  * Per-field failure → sentinel (''/0/0.0, §1.3); whole-row failure →
  * row dropped (trulia_scraper.py:114-119).
  */
object HtmlListingParser {

  private val ureBlock: Regex =
    """(?s)<table class="public-detail-quickview".*?</table>""".r
  private def field(name: String): Regex =
    ("""(?s)<span class="""" + name + """">(.*?)</span>""").r

  private def extract(block: String, name: String): Option[String] =
    field(name).findFirstMatchIn(block).map(_.group(1).trim).filter(_.nonEmpty)

  private def parseLong(s: Option[String]): Long =
    s.flatMap(v => scala.util.Try(v.replaceAll("[$,]", "").toLong).toOption)
      .getOrElse(0L)

  /** E6 — bug-for-bug positional sqft slice (ure_scraping.py:192):
    * int(stats[-12:-8]); Python negative slicing clamps at 0 and any
    * parse failure → 0 sentinel. Column twin: Cleaning.sqftSlice. */
  def sqftFromStats(stats: String): Long = {
    val len = stats.length
    val start = math.max(len - 12, 0)
    val end = math.max(len - 8, 0)
    val sub = if (end > start) stats.substring(start, end) else ""
    scala.util.Try(sub.trim.toLong).getOrElse(0L)
  }

  /** S2 — URE quickview table blocks → Listing rows. sqft prefers the
    * structured span; a fixture carrying only the raw stats line falls
    * back to the reference's positional slice (E6). */
  def parseUre(html: String): Seq[Listing] =
    ureBlock.findAllIn(html).toSeq.flatMap { block =>
      extract(block, "mls").map { mls =>
        val priceStr = extract(block, "price")
        val price = parseLong(priceStr)
        val address = extract(block, "address")
        val parts = address.map(_.split(", ").toSeq).getOrElse(Seq.empty)
        val agentName = extract(block, "agent-name")
        val stats = extract(block, "stats")
        val sqft = extract(block, "sqft") match {
          case Some(s) => parseLong(Some(s))
          case None    => stats.map(sqftFromStats).getOrElse(0L)
        }
        Listing.minimal(mls, price, source = "URE",
          city = parts.lift(1),
          agentName = agentName,
          agentPhone = extract(block, "agent-phone"))
          .copy(
            priceStr = priceStr,
            address = address,
            state = parts.lift(2).map(_.split(" ").head),
            zip = address.filter(_.length >= 5).map(a => a.substring(a.length - 5)),
            sqft = sqft,
            ppsqft = if (sqft != 0) price.toDouble / sqft else 0.0,
            stats = stats,
            broker_name = extract(block, "broker-name"),
            broker_phone = extract(block, "broker-phone"),
            // E14: the reference derives the url from the mls template
            // (ure_scraping.py:211); fixtures may pin an explicit url
            url = extract(block, "url")
              .orElse(Some(graft.functions.Cleaning.DetailUrlTemplate
                .replace("%s", mls))))
      }
    }

  /** S3 — URE detail-page facts (ure_scraping.py:211-253): the three
    * enrichment fields grafted from the per-listing detail fetch.
    * days_on_ure keeps only the last whitespace token (E16); Type and
    * Style strip their header label. Absent facts stay None (the
    * reference's ''/None sentinels are applied at sinks, §1.3). */
  final case class UreFacts(
      daysOnUre: Option[String],
      listingType: Option[String],
      style: Option[String])

  private val factsItem: Regex =
    """(?s)<div class="facts___item">\s*<span class="facts-header">(.*?)</span>\s*<div>(.*?)</div>""".r

  def parseUreFacts(html: String): UreFacts = {
    val items = factsItem.findAllMatchIn(html)
      .map(m => m.group(1).trim -> m.group(2).trim).toMap
    UreFacts(
      daysOnUre = items.get("Days on URE")
        .map(v => v.split("\\s+").last), // E16: number only
      listingType = items.get("Type")
        .map(_.replace("Type", "").trim).filter(_.nonEmpty),
      style = items.get("Style")
        .map(_.replace("Style", "").trim).filter(_.nonEmpty))
  }

  /** S5 — Trulia index page → absolute listing URLs. */
  private val truliaLink: Regex =
    """data-testid="property-card-link"\s+href="([^"]+)"""".r
  def parseTruliaUrls(html: String): Seq[String] =
    truliaLink.findAllMatchIn(html).map("https://www.trulia.com" + _.group(1)).toSeq

  /** S6 — Trulia detail page → one Listing (None = row dropped,
    * trulia_scraper.py:114-119). Beds/baths/sqft come from a
    * '•'-separated feature string classified by substring (E15).
    * Co-agent: a 'Co-Agent: Name, Phone' line split on ',' with the
    * label stripped (trulia_scraper.py:95-99). */
  def parseTruliaDetail(html: String): Option[Listing] =
    extract(html, "mls").map { mls =>
      val priceStr = extract(html, "price")
      val features = extract(html, "features").map(_.split('•').toSeq)
        .getOrElse(Seq.empty).map(_.trim.toLowerCase)
      def featNum(tag: String): Option[Long] = features
        .find(_.contains(tag))
        .flatMap(f => "[0-9]+".r.findFirstIn(f)).map(_.toLong)
      val coParts = extract(html, "co-agent")
        .filter(_.contains("Co-Agent")) // sibling-div guard, :96
        .map(_.split(",").toSeq)
      Listing.minimal(mls, parseLong(priceStr), source = "TRULIA",
        city = extract(html, "city"),
        agentName = extract(html, "agent-name"),
        agentPhone = extract(html, "agent-phone"))
        .copy(
          priceStr = priceStr,
          beds = featNum("bed"),
          baths = featNum("bath").map(_.toDouble),
          sqft = featNum("sqft").getOrElse(0L),
          co_agent_name = coParts.map(_.head.replace("Co-Agent:", "").trim),
          co_agent_phone = coParts.flatMap(_.lift(1)).map(_.trim),
          broker_name = extract(html, "broker-name"))
    }
}
