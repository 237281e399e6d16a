package graft

import graft.model.Listing
import graft.sinks.{GraphSink, InMemoryGraphWriter}

/** K1 semantics: one listing frame → 3 deduplicated node frames + 3
  * edge frames; MERGE idempotence on re-write. */
class GraphSinkSpec extends SparkSpec {
  import spark.implicits._

  private def listings = Seq(
    Listing.minimal("M1", 100, agentName = Some("Jane Doe"),
      agentPhone = Some("1")).copy(broker_name = Some("Acme"),
      broker_phone = Some("9")),
    Listing.minimal("M2", 200, agentName = Some("Jane Doe"),
      agentPhone = Some("1")).copy(broker_name = Some("Acme"),
      broker_phone = Some("9")),
    Listing.minimal("M1", 150, agentName = Some("Jane Doe"), // dup mls
      agentPhone = Some("1")),
    Listing.minimal("M3", 300, source = "TRULIA"), // no agent/broker
  ).toDS()

  test("node frames dedupe by business key; empty names filtered") {
    assert(GraphSink.listingNodes(listings).count() == 3) // M1 deduped
    assert(GraphSink.agentNodes(listings).count() == 1)   // one Jane
    assert(GraphSink.brokerNodes(listings).count() == 1)  // one Acme
    val ln = GraphSink.listingNodes(listings)
    assert(ln.columns.contains("property_details_json")) // E13 map→json
    assert(!ln.columns.contains("property_details"))
  }

  test("edge frames carry business keys, dedupe, skip null endpoints") {
    // Jane→M1 appears twice (dup mls row) and collapses; Jane→M2 stays
    assert(GraphSink.agentOfEdges(listings).count() == 2)
    assert(GraphSink.brokeredByEdges(listings).count() == 2) // M1→Acme, M2→Acme
    assert(GraphSink.worksForEdges(listings).count() == 1)   // Jane→Acme
  }

  test("writeGraph: MERGE idempotence — double write, same store") {
    InMemoryGraphWriter.clear()
    val w = new InMemoryGraphWriter
    GraphSink.writeGraph(listings, w)
    val afterFirst = InMemoryGraphWriter.store.size()
    GraphSink.writeGraph(listings, w)
    assert(InMemoryGraphWriter.store.size() == afterFirst)
    assert(InMemoryGraphWriter.keysWithPrefix("Listing|").size == 3)
    assert(InMemoryGraphWriter.keysWithPrefix("Agent|").size == 1)
    assert(InMemoryGraphWriter.keysWithPrefix("Broker|").size == 1)
    assert(InMemoryGraphWriter.keysWithPrefix("AGENT_OF|").nonEmpty)
    assert(InMemoryGraphWriter.keysWithPrefix("WORKS_FOR|").size == 1)
  }
}
