package graft.sinks.v2

import graft.sinks.InMemoryGraphWriter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K1's write path as a real DataSourceV2 — the `SupportsWrite` /
  * `BatchWrite` twin of [[graft.sources.v2.ListingSourceV2]]'s read
  * side, so the connector surface is symmetric (reference K1:
  * database_ops.py:11-92):
  *
  *   nodeFrame.write.format("graft.sinks.v2.GraphSinkV2")
  *     .option("labels", ":Agent").option("node.keys", "name,phone")
  *     .mode("append").save()
  *
  * Option surface is IDENTICAL to [[graft.sinks.GraphWriter.write]]
  * (the public Neo4j connector's names: `labels` + `node.keys` for
  * nodes, `relationship` for edges), so moving a write from the
  * foreachPartition path to the V2 path is a format string change —
  * GraphSinkV2Spec asserts both paths land bit-identical store state.
  *
  * Execution/failure semantics (what the V2 surface buys over
  * foreachPartition):
  *  - each task buffers its partition and MERGEs it in `batch.size`
  *    chunks (default 1000) with a final flush at task COMMIT — one
  *    round-trip per chunk, no driver-side row accumulation;
  *  - task `abort()` drops the unflushed tail, so a failing task
  *    stops contributing immediately; chunks already MERGEd are
  *    converged-over by the retry, because MERGE-by-business-key is
  *    idempotent — abort-then-retry lands the exact committed state
  *    (spec-proven), which is the standard idempotent-upsert
  *    two-phase story (same as the Neo4j connector's);
  *  - driver `commit(messages)` sees per-task (rows, chunks) counts;
  *    `abort(messages)` has nothing destructive to do — partial MERGEs
  *    are absorbed by the next attempt, never double-applied.
  *
  * Scale shape: parallelism = input partitions, each writer touches
  * only its partition, the backend connection is per-task (the pooled
  * Bolt session in production, a static map here), and Spark's task
  * retry + speculative execution are safe by MERGE idempotence —
  * the lost-write hole the reference's per-row autocommit had (T4)
  * stays closed under the V2 contract too.
  */
class GraphSinkV2 extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema always comes from the frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraphSinkTable(schema)
}

class GraphSinkTable(dataSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = "graft_graph_sink"
  override def schema(): StructType = dataSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraphWrite(info.schema(), GraphSinkV2Options(info.options()))
    }
}

/** Parsed, serializable option surface (parity with GraphWriter.write). */
final case class GraphSinkV2Options(
    labels: Option[String], nodeKeys: Seq[String],
    relationship: Option[String], batchSize: Int,
    backendClass: String) {
  require(relationship.isDefined || labels.isDefined,
    "GraphSinkV2 needs 'labels' or 'relationship'")
  require(relationship.isDefined || nodeKeys.nonEmpty,
    "node write needs 'node.keys'")
}

object GraphSinkV2Options {
  def apply(o: CaseInsensitiveStringMap): GraphSinkV2Options =
    GraphSinkV2Options(
      labels = Option(o.get("labels")).map(_.stripPrefix(":")),
      nodeKeys = Option(o.get("node.keys"))
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      relationship = Option(o.get("relationship")),
      batchSize = o.getInt("batch.size", 1000),
      backendClass = o.getOrDefault("backend",
        classOf[InMemoryGraphBackend].getName))
}

class GraphWrite(schema: StructType, opts: GraphSinkV2Options) extends Write {
  override def toBatch: BatchWrite = new GraphBatchWrite(schema, opts)
  override def description(): String =
    s"GraphWrite ${opts.relationship.map(r => s"rel=$r")
      .getOrElse(s"label=${opts.labels.get} keys=${opts.nodeKeys.mkString(",")}")}"
}

final case class GraphTaskCommit(partitionId: Int, taskId: Long,
    rows: Long, chunks: Long) extends WriterCommitMessage

class GraphBatchWrite(schema: StructType, opts: GraphSinkV2Options)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraphDataWriterFactory(schema, opts)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  // nothing destructive: chunks MERGEd by failed attempts are
  // converged-over (not duplicated) by the retry's MERGEs
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraphDataWriterFactory(schema: StructType, opts: GraphSinkV2Options)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val backend = Class.forName(opts.backendClass)
      .getDeclaredConstructor().newInstance().asInstanceOf[GraphBackend]
    new GraphDataWriter(schema, opts, backend, partitionId, taskId)
  }
}

class GraphDataWriter(schema: StructType, opts: GraphSinkV2Options,
    backend: GraphBackend, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val deserialize = ExpressionEncoder(RowEncoder.encoderFor(schema))
    .resolveAndBind().createDeserializer()
  private val cols = schema.fieldNames
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
  private var rows = 0L
  private var chunks = 0L

  override def write(record: InternalRow): Unit = {
    val r = deserialize(record)
    buf += cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    rows += 1
    if (buf.size >= opts.batchSize) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    opts.relationship match {
      case Some(rel) => backend.mergeEdges(rel, buf.toSeq)
      case None => backend.mergeNodes(opts.labels.get, opts.nodeKeys, buf.toSeq)
    }
    chunks += 1
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GraphTaskCommit(partitionId, taskId, rows, chunks)
  }

  /** Drop the unflushed tail; already-flushed chunks are safe to
    * leave — the retry's MERGEs converge over them. */
  override def abort(): Unit = buf.clear()

  override def close(): Unit = ()
}

/** Per-task MERGE connection — the pooled Bolt session in production.
  * Implementations must be idempotent by business key: re-merging a
  * chunk is a no-op, which is what makes task retry + speculation
  * safe. */
trait GraphBackend extends Serializable {
  def mergeNodes(label: String, keys: Seq[String],
      rows: Seq[Map[String, Any]]): Unit
  def mergeEdges(relType: String, rows: Seq[Map[String, Any]]): Unit
}

/** Test/local backend: EXACTLY the key scheme of
  * [[graft.sinks.InMemoryGraphWriter]], writing to the same static
  * store — so GraphSinkV2Spec can assert the V2 path and the
  * foreachPartition path land bit-identical state. */
class InMemoryGraphBackend extends GraphBackend {
  def mergeNodes(label: String, keys: Seq[String],
      rows: Seq[Map[String, Any]]): Unit =
    rows.foreach { all =>
      val key = label + "|" + keys.map(k => String.valueOf(all(k))).mkString("|")
      InMemoryGraphWriter.store.put(key, all)
    }

  def mergeEdges(relType: String, rows: Seq[Map[String, Any]]): Unit =
    rows.foreach { all =>
      val key = relType + "|" +
        all.keys.toSeq.sorted.map(c => String.valueOf(all(c))).mkString("|")
      InMemoryGraphWriter.store.put(key, all)
    }
}
