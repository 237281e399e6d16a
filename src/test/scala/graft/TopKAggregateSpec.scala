package graft

import graft.functions.{BoundedTopK, Scored}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKAggregate, TopKBuf}

/** The native primitive-buffer top-k aggregate: equivalence with the
  * [[BoundedTopK]] Aggregator (kept as the executable reference
  * implementation), tie-break order, buffer mechanics, and
  * serialization round-trip. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("native top-k == Aggregator reference on a grouped fixture") {
    // deterministic pseudo-random scores with planted exact ties, plus
    // planted NaN rows: both implementations must drop NaN (a NaN that
    // entered either buffer would surface here as a set mismatch or as
    // an arrival-order-dependent flake)
    val rows = for (g <- 0 until 7; i <- 0 until 200) yield
      (g.toLong, i.toLong,
        if (i % 37 == 0) Double.NaN
        else ((i * 2654435761L + g) % 1000) / 1000.0)
    val df = rows.toDF("g", "id", "score")
    val native = df.groupBy($"g")
      .agg(TopKAggregate.of($"id", $"score", 5).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "e")))
      .select($"g", $"pos", $"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ref = udaf(new BoundedTopK(5), ExpressionEncoder[Scored]())
    val viaAgg = df.groupBy($"g")
      .agg(ref($"id", $"score").as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "e")))
      .select($"g", $"pos", $"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(native == viaAgg)
  }

  test("tie-break is score DESC then id ASC; cap discards the right tail") {
    val buf = new TopKBuf(3)
    Seq((5L, 1.0), (9L, 1.0), (1L, 1.0), (7L, 2.0), (3L, 0.5))
      .foreach { case (id, s) => buf.insert(id, s) }
    // top 3: (7, 2.0), then the 1.0-tie by id: 1, 5; 9 and 0.5 dropped
    assert(buf.n == 3)
    assert((0 until buf.n).map(i => (buf.ids(i), buf.scores(i))) ==
      Seq((7L, 2.0), (1L, 1.0), (5L, 1.0)))
  }

  test("serialize/deserialize round-trips and merge respects the cap") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKAggregate(Literal(0L), Literal(0.0), k = 4)
    val a = new TopKBuf(4)
    Seq((1L, 0.9), (2L, 0.8)).foreach { case (i, s) => a.insert(i, s) }
    val b = agg.deserialize(agg.serialize(a))
    assert(b.n == a.n &&
      (0 until a.n).forall(i => a.ids(i) == b.ids(i) && a.scores(i) == b.scores(i)))
    val c = new TopKBuf(4)
    Seq((3L, 0.95), (4L, 0.7), (5L, 0.85)).foreach { case (i, s) => c.insert(i, s) }
    val m = agg.merge(b, c)
    assert(m.n == 4)
    assert((0 until m.n).map(m.ids(_)) == Seq(3L, 1L, 5L, 2L)) // 4 (0.7) evicted
  }

  test("NaN scores are dropped, not admitted in arrival order") {
    // NaN breaks the total order, so it must never enter the buffer —
    // regardless of whether it arrives while the buffer has room.
    val df = Seq((1L, Double.NaN), (2L, 0.5), (3L, Double.NaN), (4L, 0.9))
      .toDF("id", "score").repartition(3)
    val out = df.agg(TopKAggregate.of($"id", $"score", 3).as("tk"))
      .select(explode($"tk").as("e")).select($"e.id", $"e.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((4L, 0.9), (2L, 0.5)))
  }

  test("mis-typed inputs fail at analysis time, not executor runtime") {
    val df = Seq((1, 0.5f)).toDF("id", "score") // int id, float score
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(TopKAggregate.of($"id", $"score", 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bounded_topk") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
