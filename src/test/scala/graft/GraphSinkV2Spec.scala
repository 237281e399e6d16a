package graft

import graft.sinks.{GraphSink, InMemoryGraphWriter}
import graft.sinks.v2._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** The DataSourceV2 write path (SupportsWrite/BatchWrite) must be a
  * drop-in for the foreachPartition path: same option surface, same
  * store state, and Spark-native failure semantics — an aborted task
  * attempt followed by a committed retry lands exactly the committed
  * state (MERGE idempotence). */
class GraphSinkV2Spec extends SparkSpec {
  import spark.implicits._

  private def agentFrame = Seq(
    ("Ann Agent", "801-555-0001"),
    ("Bob Broker", "801-555-0002"),
    ("Ann Agent", "801-555-0001")) // dup row: MERGE collapses it
    .toDF("name", "phone")

  private def snapshot(): Map[String, Map[String, Any]] =
    InMemoryGraphWriter.store.asScala.toMap

  test("option-surface parity: V2 write == GraphWriter.write, same store") {
    val opts = Map("labels" -> ":Agent", "node.keys" -> "name,phone")

    InMemoryGraphWriter.clear()
    new InMemoryGraphWriter().write(agentFrame, opts)
    val legacy = snapshot()

    InMemoryGraphWriter.clear()
    agentFrame.write.format("graft.sinks.v2.GraphSinkV2")
      .options(opts).mode("append").save()
    val v2 = snapshot()

    assert(v2 == legacy, "V2 and foreachPartition paths must land " +
      "bit-identical store state for identical options")
    assert(v2.keySet == Set(
      "Agent|Ann Agent|801-555-0001", "Agent|Bob Broker|801-555-0002"))
  }

  test("edge writes: same parity through the relationship option") {
    val edges = Seq(("Ann Agent", "801-555-0001", "MLS-1"))
      .toDF("src_name", "src_phone", "dst_mls")
    val opts = Map("relationship" -> "AGENT_OF")

    InMemoryGraphWriter.clear()
    new InMemoryGraphWriter().write(edges, opts)
    val legacy = snapshot()

    InMemoryGraphWriter.clear()
    edges.write.format("graft.sinks.v2.GraphSinkV2")
      .options(opts).mode("append").save()
    assert(snapshot() == legacy)
  }

  test("abort-then-retry idempotence: aborted attempt converges to committed state") {
    InMemoryGraphWriter.clear()
    val schema = agentFrame.schema
    val opts = GraphSinkV2Options(new CaseInsensitiveStringMap(
      Map("labels" -> ":Agent", "node.keys" -> "name,phone",
        "batch.size" -> "1").asJava)) // chunk per row → abort after flushes
    val factory = new GraphBatchWrite(schema, opts)
      .createBatchWriterFactory(null)
    val serialize = ExpressionEncoder(RowEncoder.encoderFor(schema))
      .createSerializer()

    // attempt 1: writes two rows (each flushed as its own chunk), then
    // fails before task commit → abort()
    val attempt1 = factory.createWriter(0, 0L)
    agentFrame.collect().take(2)
      .foreach(r => attempt1.write(serialize(r).copy()))
    attempt1.abort()
    val partial = snapshot()
    assert(partial.nonEmpty && partial.size <= 2,
      "aborted attempt leaves only already-flushed chunks behind")

    // retry: full partition, committed
    val attempt2 = factory.createWriter(0, 1L)
    agentFrame.collect().foreach(r => attempt2.write(serialize(r).copy()))
    attempt2.commit()
    val afterRetry = snapshot()

    // reference: a clean committed-only run
    InMemoryGraphWriter.clear()
    val clean = factory.createWriter(0, 2L)
    agentFrame.collect().foreach(r => clean.write(serialize(r).copy()))
    clean.commit()

    assert(afterRetry == snapshot(),
      "abort-then-retry must land exactly the committed-only state")
  }

  test("double save is idempotent and commit messages carry counts") {
    InMemoryGraphWriter.clear()
    agentFrame.write.format("graft.sinks.v2.GraphSinkV2")
      .option("labels", ":Agent").option("node.keys", "name,phone")
      .mode("append").save()
    val once = snapshot()
    agentFrame.write.format("graft.sinks.v2.GraphSinkV2")
      .option("labels", ":Agent").option("node.keys", "name,phone")
      .mode("append").save()
    assert(snapshot() == once, "double write must MERGE to the same state")

    // task-level commit message accounting
    val schema = agentFrame.schema
    val opts = GraphSinkV2Options(new CaseInsensitiveStringMap(
      Map("labels" -> ":Agent", "node.keys" -> "name,phone").asJava))
    val w = new GraphBatchWrite(schema, opts)
      .createBatchWriterFactory(null).createWriter(7, 42L)
    val serialize = ExpressionEncoder(RowEncoder.encoderFor(schema))
      .createSerializer()
    agentFrame.collect().foreach(r => w.write(serialize(r).copy()))
    val msg = w.commit().asInstanceOf[GraphTaskCommit]
    assert(msg.partitionId == 7 && msg.taskId == 42L &&
      msg.rows == 3L && msg.chunks == 1L)
  }

  test("missing options fail fast with the GraphWriter error contract") {
    intercept[Exception] {
      agentFrame.write.format("graft.sinks.v2.GraphSinkV2")
        .mode("append").save() // neither labels nor relationship
    }
    intercept[Exception] {
      agentFrame.write.format("graft.sinks.v2.GraphSinkV2")
        .option("labels", ":Agent") // no node.keys
        .mode("append").save()
    }
  }

  test("writeGraph via V2 format lands the same graph as the GraphWriter path") {
    import graft.model.Listing
    val listings = Seq(
      Listing.minimal("M1", 100, agentName = Some("Jane Doe"),
        agentPhone = Some("1")).copy(broker_name = Some("Acme"),
        broker_phone = Some("9")),
      Listing.minimal("M2", 200, agentName = Some("Jane Doe"),
        agentPhone = Some("1")).copy(broker_name = Some("Acme"),
        broker_phone = Some("9")),
      Listing.minimal("M3", 300, source = "TRULIA")).toDS()
    InMemoryGraphWriter.clear()
    GraphSink.writeGraph(listings, new InMemoryGraphWriter)
    val legacy = snapshot()

    InMemoryGraphWriter.clear()
    def save(df: org.apache.spark.sql.DataFrame, o: Map[String, String]): Unit =
      df.write.format("graft.sinks.v2.GraphSinkV2")
        .options(o).mode("append").save()
    save(GraphSink.listingNodes(listings),
      Map("labels" -> ":Listing", "node.keys" -> "mls"))
    save(GraphSink.agentNodes(listings),
      Map("labels" -> ":Agent", "node.keys" -> "name,phone"))
    save(GraphSink.brokerNodes(listings),
      Map("labels" -> ":Broker", "node.keys" -> "name,phone"))
    save(GraphSink.agentOfEdges(listings), Map("relationship" -> "AGENT_OF"))
    save(GraphSink.brokeredByEdges(listings),
      Map("relationship" -> "BROKERED_BY"))
    save(GraphSink.worksForEdges(listings), Map("relationship" -> "WORKS_FOR"))

    assert(snapshot().keySet == legacy.keySet,
      "full-graph V2 write must produce the same node/edge keys")
  }
}
