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

  /** S2 — URE quickview table blocks → Listing rows. */
  def parseUre(html: String): Seq[Listing] =
    ureBlock.findAllIn(html).toSeq.flatMap { block =>
      extract(block, "mls").map { mls =>
        val priceStr = extract(block, "price")
        val price = parseLong(priceStr)
        val address = extract(block, "address")
        val parts = address.map(_.split(", ").toSeq).getOrElse(Seq.empty)
        val agentName = extract(block, "agent-name")
        val sqft = parseLong(extract(block, "sqft"))
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
            broker_name = extract(block, "broker-name"),
            broker_phone = extract(block, "broker-phone"),
            url = extract(block, "url"))
      }
    }

  /** S5 — Trulia index page → absolute listing URLs. */
  private val truliaLink: Regex =
    """data-testid="property-card-link"\s+href="([^"]+)"""".r
  def parseTruliaUrls(html: String): Seq[String] =
    truliaLink.findAllMatchIn(html).map("https://www.trulia.com" + _.group(1)).toSeq

  /** S6 — Trulia detail page → one Listing (None = row dropped,
    * trulia_scraper.py:114-119). Beds/baths/sqft come from a
    * '•'-separated feature string classified by substring (E15). */
  def parseTruliaDetail(html: String): Option[Listing] =
    extract(html, "mls").map { mls =>
      val priceStr = extract(html, "price")
      val features = extract(html, "features").map(_.split('•').toSeq)
        .getOrElse(Seq.empty).map(_.trim.toLowerCase)
      def featNum(tag: String): Option[Long] = features
        .find(_.contains(tag))
        .flatMap(f => "[0-9]+".r.findFirstIn(f)).map(_.toLong)
      Listing.minimal(mls, parseLong(priceStr), source = "TRULIA",
        city = extract(html, "city"),
        agentName = extract(html, "agent-name"),
        agentPhone = extract(html, "agent-phone"))
        .copy(
          priceStr = priceStr,
          beds = featNum("bed"),
          baths = featNum("bath").map(_.toDouble),
          sqft = featNum("sqft").getOrElse(0L),
          broker_name = extract(html, "broker-name"))
    }
}
