package graft.sinks

import graft.model.Listing
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** K1 — the property-graph sink (SURVEY §2.2), re-expressed as
  * relational derivations: the reference's 6 per-row Cypher MERGEs
  * (/root/reference/database_ops.py:14-90) become 3 deduplicated node
  * frames + 3 edge frames projected from one listing DataFrame, then
  * written per-partition through a pluggable [[GraphWriter]].
  *
  * Scale: dedup is one hash-aggregate per frame; the writer batches
  * one round-trip per partition (vs the reference's 6 round-trips per
  * ROW) and MERGE-by-key keeps the sink idempotent, closing the
  * reference's lost-write hole (T4) under at-least-once retry.
  */
object GraphSink {

  /** Node frame: listings keyed by mls, labeled by source (the
    * reference's dynamic node label, database_ops.py:15). */
  def listingNodes(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .dropDuplicates("mls")
      .withColumn("property_details_json", to_json(col("property_details")))
      .drop("property_details")

  /** :Agent nodes keyed by (name, phone) (database_ops.py:61-64). */
  def agentNodes(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .select(col("agent_name").as("name"), col("agent_phone").as("phone"))
      .filter(col("name").isNotNull && length(trim(col("name"))) > 0)
      .dropDuplicates("name", "phone")

  /** :Broker nodes keyed by (name, phone) (database_ops.py:67-70). */
  def brokerNodes(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .select(col("broker_name").as("name"), col("broker_phone").as("phone"))
      .filter(col("name").isNotNull && length(trim(col("name"))) > 0)
      .dropDuplicates("name", "phone")

  /** Edge frames carry business keys; the writer resolves endpoints
    * (database_ops.py:73-90). */
  def agentOfEdges(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .filter(col("agent_name").isNotNull)
      .select(col("agent_name").as("src_name"),
        col("agent_phone").as("src_phone"), col("mls").as("dst_mls"))
      .dropDuplicates()

  def brokeredByEdges(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .filter(col("broker_name").isNotNull)
      .select(col("mls").as("src_mls"), col("broker_name").as("dst_name"),
        col("broker_phone").as("dst_phone"))
      .dropDuplicates()

  def worksForEdges(listings: Dataset[Listing]): DataFrame =
    listings.toDF()
      .filter(col("agent_name").isNotNull && col("broker_name").isNotNull)
      .select(col("agent_name").as("src_name"),
        col("agent_phone").as("src_phone"),
        col("broker_name").as("dst_name"),
        col("broker_phone").as("dst_phone"))
      .dropDuplicates()

  /** Write the whole graph: 3 node frames + 3 edge frames. */
  def writeGraph(listings: Dataset[Listing], writer: GraphWriter): Unit = {
    val cached = listings.cache()
    try {
      writer.writeNodes(listingNodes(cached), "Listing", Seq("mls"))
      writer.writeNodes(agentNodes(cached), "Agent", Seq("name", "phone"))
      writer.writeNodes(brokerNodes(cached), "Broker", Seq("name", "phone"))
      writer.writeEdges(agentOfEdges(cached), "AGENT_OF")
      writer.writeEdges(brokeredByEdges(cached), "BROKERED_BY")
      writer.writeEdges(worksForEdges(cached), "WORKS_FOR")
    } finally cached.unpersist()
  }
}

/** Pluggable graph writer. The production impl would batch MERGE
  * statements per partition over a pooled Bolt connection (connector
  * option surface); tests use [[InMemoryGraphWriter]]. */
trait GraphWriter extends Serializable {
  def writeNodes(nodes: DataFrame, label: String, keys: Seq[String]): Unit
  def writeEdges(edges: DataFrame, relType: String): Unit
}

/** Test/local writer: collects per-partition batches into a static
  * store (valid in local mode where executors share the JVM); MERGE
  * semantics = last-write-wins by key, exercised by the specs. */
class InMemoryGraphWriter extends GraphWriter {
  import InMemoryGraphWriter._

  def writeNodes(nodes: DataFrame, label: String, keys: Seq[String]): Unit = {
    val cols = nodes.columns
    nodes.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        val all = cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
        val key = label + "|" + keys.map(k => String.valueOf(all(k))).mkString("|")
        store.put(key, all) // MERGE: upsert by business key
      }
    }
  }

  def writeEdges(edges: DataFrame, relType: String): Unit = {
    val cols = edges.columns
    edges.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        val all = cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
        val key = relType + "|" + cols.sorted.map(c => String.valueOf(all(c))).mkString("|")
        store.put(key, all)
      }
    }
  }
}

object InMemoryGraphWriter {
  val store = new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
  def clear(): Unit = store.clear()
  def keysWithPrefix(p: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    store.keySet().asScala.filter(_.startsWith(p)).toSeq
  }
}
