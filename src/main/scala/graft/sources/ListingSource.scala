package graft.sources

import graft.model.Listing
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S4 — the listing source abstraction (SURVEY §7.1): all execution
  * goes through [[FixtureSource]] (zero-egress environment); the HTTP
  * scraping source exists as a structure-only skeleton documenting how
  * the paginated scan maps onto Spark partitions.
  */
trait ListingSource {
  /** One logical scan: all listings for the given zip codes. */
  def scan(spark: SparkSession, zipCodes: Seq[String]): Dataset[Listing]
}

/** Fixture-backed source: raw page HTML (one row per fetched page,
  * keyed by zip) parsed distributed via the S2 flatMap extractor.
  * This is the exact operator shape the HTTP source would feed —
  * `pages` stands in for the responses of the paginated GET loop
  * (/root/reference/ure_scraping.py:19-49).
  *
  * S3/J4 — detail-page enrichment: when `detailPages` is supplied
  * (url, html), each parsed listing is left-joined to its detail page
  * by url and the facts fields (days_on_ure / type / style,
  * ure_scraping.py:211-253) are grafted on. ONE batched join keyed by
  * url replaces the reference's per-row GET — the N+1 fix (SURVEY §4);
  * rows without a detail page keep their None facts (the reference's
  * RequestException path, :250-253).
  */
class FixtureSource(
    pages: DataFrame /* zip: string, html: string */,
    detailPages: Option[DataFrame] = None /* url: string, html: string */)
    extends ListingSource {
  def scan(spark: SparkSession, zipCodes: Seq[String]): Dataset[Listing] = {
    import spark.implicits._
    val base = pages
      .filter(col("zip").isInCollection(zipCodes))
      .select(col("html")).as[String]
      .flatMap(HtmlListingParser.parseUre _)
    detailPages match {
      case None => base
      case Some(d) =>
        val det = d.select(col("url").as("_durl"), col("html").as("_dhtml"))
        base.joinWith(det, base("url") === det("_durl"), "left_outer")
          .map { case (l, row) =>
            if (row == null) l
            else {
              val facts = HtmlListingParser.parseUreFacts(row.getString(1))
              l.copy(days_on_ure = facts.daysOnUre,
                `type` = facts.listingType, style = facts.style)
            }
          }
    }
  }
}

/** S4–S6 fixture source: Trulia-shaped two-phase scan — an index page
  * per zip yields listing URLs (S5), then detail pages resolve to
  * rows (S6). The detail "fetch" is a lookup join against the fixture
  * detail frame — the partition-batched replacement for the
  * reference's per-row GET (trulia_scraper.py:50,140). */
class TruliaFixtureSource(
    indexPages: DataFrame /* zip: string, html: string */,
    detailPages: DataFrame /* url: string, html: string */)
    extends ListingSource {
  def scan(spark: SparkSession, zipCodes: Seq[String]): Dataset[Listing] = {
    import spark.implicits._
    val urls = indexPages
      .filter(col("zip").isInCollection(zipCodes))
      .select(col("html")).as[String]
      .flatMap(HtmlListingParser.parseTruliaUrls _)
      .toDF("url")
    urls.join(detailPages, "url")
      .select(col("html")).as[String]
      .flatMap(h => HtmlListingParser.parseTruliaDetail(h))
  }
}

/** The paginated HTTP source (S1) with the transport injected. Layout:
  *  - one input partition per zip code (353 partitions at reference
  *    scale — matches all_zip_codes.json);
  *  - inside each partition, the pagination loop `page=1,2,…`
  *    (ure_scraping.py:23-47) runs lazily until a fetch error or a
  *    page that parses to zero listings (F7 early termination), with
  *    ONE client per partition (connection reuse, §4) — never one
  *    request per row from the driver;
  *  - server-side predicates (maxPrice/minSqFt/minLotSize, F1) are
  *    encoded in the URL template (E14, ure_scraping.py:26) — the
  *    source-pushdown analog of SupportsPushDownFilters;
  *  - detail-page enrichment (S3/J4) happens in the same partition
  *    pass, batched, replacing the reference's N+1 per-row GETs.
  *
  * `fetchPage(url)` is the transport seam: None = fetch error (the
  * RequestException break, :31-34). The default throws — zero-egress
  * CI runs the loop through a fixture-backed fetcher (see
  * PaginationSpec); production would pass an HTTP client call.
  */
class PaginatedHttpSource(urlTemplate: String, maxPrice: Long,
    minSqFt: Long, minLotSize: Double,
    fetchPage: String => Option[String] = PaginatedHttpSource.noNetwork)
    extends ListingSource with Serializable {

  /** ure_scraping.py:26 — {0}=zip {1}=maxPrice {2}=minSqFt
    * {3}=minLotSize {4}=page. */
  def pageUrl(zip: String, page: Int): String =
    urlTemplate.format(zip, maxPrice, minSqFt, minLotSize, page)

  /** F7: lazy page stream per zip — stops at the first fetch error or
    * empty parse; pages after the stop are never fetched. */
  def zipListings(zip: String): Iterator[Listing] =
    Iterator.from(1)
      .map(page => fetchPage(pageUrl(zip, page))
        .map(HtmlListingParser.parseUre).getOrElse(Seq.empty))
      .takeWhile(_.nonEmpty)
      .flatten

  def scan(spark: SparkSession, zipCodes: Seq[String]): Dataset[Listing] = {
    import spark.implicits._
    spark.createDataset(zipCodes)
      .repartition(zipCodes.size) // one partition per zip
      .flatMap(zip => zipListings(zip))
  }
}

object PaginatedHttpSource {
  val noNetwork: String => Option[String] = _ =>
    throw new UnsupportedOperationException(
      "network source disabled in this environment — use FixtureSource")
}

/** S7/S8/S9 — the reference's file scans as Spark reads. */
object FileScans {

  /** S7: contacts CSV → normalized 3-column frame
    * (data_loader.py:26-35). */
  def contacts(spark: SparkSession, path: String): DataFrame = {
    import graft.functions.Cleaning
    spark.read.option("header", "true").csv(path)
      .select(
        col("First Name").cast("string").as("first_name"),
        col("Last Name").cast("string").as("last_name"),
        Cleaning.normalizePhone(col("Phone")).as("phone"))
  }

  /** S8: flat JSON zip array (data_loader.py:5-14). A bare array of
    * scalars isn't line-delimited JSON — read whole-text and explode
    * the parsed array. */
  def zipCodes(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(explode(from_json(col("value"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))).as("zip"))

  /** S9: nested {county:{city:[zip]}} JSON → flat (county, city, zip)
    * rows with optional county membership filter (config.py:18-49).
    * Double explode over MapType + ArrayType. */
  def nestedZips(spark: SparkSession, path: String,
      counties: Seq[String] = Seq.empty): DataFrame = {
    val raw = spark.read.option("multiLine", "true")
      .json(path) // struct of county → struct of city → array<zip>
    // JSON objects infer as structs; unpivot via stack-free melt:
    val countyCols = raw.schema.fieldNames
    val asMap = raw.select(
      map_from_arrays(
        array(countyCols.toIndexedSeq.map(lit): _*),
        array(countyCols.toIndexedSeq.map(c => to_json(col(s"`$c`"))): _*)).as("m"))
    val exploded = asMap
      .select(explode(col("m")).as(Seq("county", "cities_json")))
      .select(col("county"),
        explode(from_json(col("cities_json"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType))))
          .as(Seq("city", "zips")))
      .select(col("county"), col("city"), explode(col("zips")).as("zip"))
    val filtered =
      if (counties.isEmpty) exploded
      else exploded.filter(col("county").isInCollection(counties))
    // F6: zip validity — 5 chars all digits (utahZip.py:39)
    filtered.filter(col("zip").rlike("^[0-9]{5}$"))
  }
}
