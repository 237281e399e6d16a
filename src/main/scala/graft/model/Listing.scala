package graft.model

/** The engine's one listing schema (SURVEY §1.2), mirroring
  * Listing.__init__ (/root/reference/listing.py:5-40) plus `source`,
  * which replaces the reference's dynamic Neo4j node label
  * (/root/reference/database_ops.py:15).
  *
  * Engine discipline (§1.3): real nulls internally (Options here);
  * reference-faithful sentinel defaults (''/0/0.0) are applied only at
  * sinks via [[graft.functions.Cleaning]].
  */
final case class Listing(
    mls: String,
    price: Long,
    priceStr: Option[String],
    photoUrl: Option[String],
    address: Option[String],
    city: Option[String],
    state: Option[String],
    zip: Option[String],
    sqft: Long,
    ppsqft: Double,
    acres: Double,
    foundDate: Long, // epoch seconds (listing.py:17)
    stats: Option[String],
    url: Option[String],
    agent_name: Option[String],
    agent_first_name: Option[String],
    agent_last_name: Option[String],
    agent_phone: Option[String],
    co_agent_name: Option[String],
    co_agent_phone: Option[String],
    broker_name: Option[String],
    broker_phone: Option[String],
    expiration_date: Option[String], // listing.py:28 ('' sentinel at sinks)
    page_views: Long,
    favorited: Long,
    days_online: Long,
    days_left: Long,
    description: Option[String],
    property_details: Map[String, String],
    email: Option[String],
    price_change_date: Option[String],
    price_change_percentage: Double,
    `type`: Option[String],
    style: Option[String],
    days_on_ure: Option[String],
    beds: Option[Long],   // Trulia-only (trulia_scraper.py:107)
    baths: Option[Double], // Trulia-only (trulia_scraper.py:109)
    source: String // 'URE' | 'TRULIA'
)

object Listing {
  /** Minimal constructor for tests/fixtures: everything defaulted. */
  def minimal(mls: String, price: Long, source: String = "URE",
      city: Option[String] = None,
      agentName: Option[String] = None,
      agentPhone: Option[String] = None,
      foundDate: Long = 0L): Listing = Listing(
    mls = mls, price = price, priceStr = None, photoUrl = None,
    address = None, city = city, state = None, zip = None,
    sqft = 0L, ppsqft = 0.0, acres = 0.0, foundDate = foundDate,
    stats = None, url = None,
    agent_name = agentName,
    agent_first_name = agentName.map(_.split(" ").head),
    agent_last_name = agentName.map(n => n.split(" ").drop(1).mkString(" ")),
    agent_phone = agentPhone,
    co_agent_name = None, co_agent_phone = None,
    broker_name = None, broker_phone = None,
    expiration_date = None,
    page_views = 0L, favorited = 0L, days_online = 0L, days_left = 0L,
    description = None, property_details = Map.empty, email = None,
    price_change_date = None, price_change_percentage = 0.0,
    `type` = None, style = None, days_on_ure = None,
    beds = None, baths = None, source = source)
}

/** CDC output event (SURVEY §2.9 T2): status ∈ new_listing |
  * price_change | off_market, additionalText carries the price-change
  * description exactly as main.py:28,33 / hunter.py:348 shape it. */
final case class ListingEvent(
    mls: String,
    status: String,
    additionalText: Option[String],
    price: Long,
    oldPrice: Option[Long],
    priceChangePct: Option[Double],
    timeOnMarketDays: Option[Int],
    source: String)
