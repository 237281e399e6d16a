package graft.sources.v2

import graft.model.Listing
import graft.sources.HtmlListingParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S1 as a real DataSourceV2 (SURVEY §7.3 "custom DataSourceV2
  * skeleton") — the connector surface a production listing scan would
  * ship:
  *
  *   spark.read.format("graft.sources.v2.ListingSourceV2")
  *     .option("path", dir).option("zips", "84601,84058").load()
  *
  *  - ONE InputPartition PER ZIP (the reference's per-zip loop,
  *    main.py:117, became the partition layout — 353 parallel tasks at
  *    reference scale);
  *  - F1 predicate pushdown via SupportsPushDownFilters: price/sqft
  *    bounds are accepted into the scan and applied "server-side"
  *    inside the reader — the V2 analog of the reference encoding
  *    maxPrice/minSqFt in the request URL (ure_scraping.py:26). The
  *    pushed set is surfaced in the scan description so plans show it;
  *  - the transport is a file per zip (`<path>/<zip>.html`) standing in
  *    for the paginated HTTP responses (zero-egress environment); rows
  *    come out of the same S2 flatMap extractor.
  */
class ListingSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ListingSourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ListingTable(properties.get("path"),
      Option(properties.get("zips")).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq.empty))
}

object ListingSourceV2 {
  val schema: StructType = ExpressionEncoder[Listing]().schema
}

class ListingTable(path: String, zips: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"graft_listings($path)"
  override def schema(): StructType = ListingSourceV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ListingScanBuilder(path, zips)
}

class ListingScanBuilder(path: String, zips: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Accept the server-side-encodable bounds (F1): price ≤ maxPrice,
    * sqft ≥ minSqFt. Everything is also returned for Spark to
    * re-evaluate — pushdown is an optimization, not a correctness
    * dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.collect {
      case f @ LessThanOrEqual("price", _: java.lang.Long)    => f
      case f @ GreaterThanOrEqual("sqft", _: java.lang.Long)  => f
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ListingScan(path, zips, pushed)
}

final case class ZipPartition(zip: String) extends InputPartition

class ListingScan(path: String, zips: Seq[String], pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = ListingSourceV2.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ListingScan path=$path zips=${zips.mkString("|")} " +
      s"pushed=[${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    zips.map(ZipPartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ListingReaderFactory(path, pushed)
}

class ListingReaderFactory(path: String, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val zip = partition.asInstanceOf[ZipPartition].zip
    new PartitionReader[InternalRow] {
      private val serializer = ExpressionEncoder[Listing]().createSerializer()
      // "server-side" application of the pushed bounds (F1)
      private val keep: Listing => Boolean = l => pushed.forall {
        case LessThanOrEqual("price", v: java.lang.Long)   => l.price <= v
        case GreaterThanOrEqual("sqft", v: java.lang.Long) => l.sqft >= v
        case _ => true
      }
      private val rows: Iterator[Listing] = {
        val file = java.nio.file.Paths.get(path, s"$zip.html")
        if (java.nio.file.Files.exists(file))
          HtmlListingParser.parseUre(java.nio.file.Files.readString(file))
            .iterator.filter(keep)
        else Iterator.empty // zip with no fixture = empty page (F7)
      }
      private var current: Listing = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = serializer(current).copy()
      override def close(): Unit = ()
    }
  }
}
