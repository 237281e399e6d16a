package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArgMax2

/** The hash-aggregable argmax: exact parity with the `max(struct)`
  * idiom it replaced, the physical-plan property that motivated it
  * (HashAggregate, never SortAggregate), and the skip/empty-group
  * edges. */
class ArgMax2Spec extends SparkSpec {
  import spark.implicits._

  /** Pseudo-random (group, ord, key) rows with PLANTED exact ties —
    * the tie-break path is the part max(struct) got subtly right and
    * a replacement could get wrong. */
  private def fixture = {
    val rows = for (g <- 0 until 11; i <- 0 until 300) yield
      (g.toLong, ((i * 2654435761L + g) % 50).toDouble / 8.0, i.toLong)
    rows.toDF("g", "ord", "key")
  }

  test("long-ordered argmax == max(struct) on planted ties") {
    val df = fixture.select($"g", ($"ord" * 8).cast("long").as("ord"), $"key")
    val viaStruct = df.groupBy($"g")
      .agg(max(struct($"ord", (-$"key").as("nk"))).as("m"))
      .select($"g", $"m.ord", (-$"m.nk").as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = df.groupBy($"g")
      .agg(ArgMax2.of($"ord", -$"key").as("m"))
      .select($"g", $"m.ord", (-$"m.tie").as("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == viaStruct)
  }

  test("double-ordered argmax == max(struct), int tiebreak auto-casts") {
    val df = fixture.select($"g", $"ord", $"key".cast("int").as("key"))
    val viaStruct = df.groupBy($"g")
      .agg(max(struct($"ord", (-$"key").as("nk"))).as("m"))
      .select($"g", $"m.ord", (-$"m.nk").cast("long").as("key"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val native = df.groupBy($"g")
      .agg(ArgMax2.of($"ord", -$"key").as("m"))
      .select($"g", $"m.ord", (-$"m.tie").as("key"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(native == viaStruct)
  }

  test("null ord/tie rows are skipped; all-null group -> null struct") {
    val df = Seq[(Long, java.lang.Double, java.lang.Long)](
      (1L, 2.0, 10L), (1L, null, 99L), (1L, 3.0, null), // nulls skipped
      (2L, null, 1L), (2L, 1.0, null)                   // nothing valid
    ).toDF("g", "ord", "key")
    val out = df.groupBy($"g").agg(ArgMax2.of($"ord", $"key").as("m"))
      .select($"g", $"m.ord", $"m.tie")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(out == Set(
      (1L, Some(2.0), Some(10L)),
      (2L, None, None)))
  }

  test("plans as HashAggregate — the SortAggregate fallback is the bug") {
    // executedPlan is the AQE wrapper; count nodes from its rendered
    // initial plan (the PlanAudit convention)
    val plan = fixture.groupBy($"g")
      .agg(ArgMax2.of($"ord", -$"key").as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortAggregate"))
    // and the idiom it replaces really does lose hash aggregation —
    // guard against a Spark upgrade silently making this moot
    val old = fixture.groupBy($"g")
      .agg(max(struct($"ord", (-$"key").as("nk"))).as("m"))
      .queryExecution.executedPlan.toString
    assert(old.contains("SortAggregate"))
  }
}
