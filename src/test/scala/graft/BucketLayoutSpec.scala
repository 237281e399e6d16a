package graft

import graft.tools.BucketLayout
import org.apache.spark.sql.functions._

/** The co-located-join contract: joining two tables bucketed on the
  * join key plans with NO exchange on either side (the shuffle was
  * paid once at write time) and returns exactly the shuffled join's
  * rows. */
class BucketLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def withTables[T](body: => T): T =
    try body finally {
      spark.sql("DROP TABLE IF EXISTS bl_orders")
      spark.sql("DROP TABLE IF EXISTS bl_lineitem")
    }

  test("bucketed join: zero exchanges, row parity with the shuffled join") {
    withTables {
      val d = sf("sf0.001")
      val orders = Tables.orders(spark, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val lineitem = Tables.lineitem(spark, d)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      BucketLayout.writeBucketed(orders, "bl_orders", "o_orderkey", 8)
      BucketLayout.writeBucketed(lineitem, "bl_lineitem", "l_orderkey", 8)

      // force the join strategy that would otherwise shuffle both
      // sides, so an absent Exchange can only come from bucketing
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("bl_orders")
          .join(spark.table("bl_lineitem"),
            $"o_orderkey" === $"l_orderkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$plan")

        val want = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
          .collect().map(_.toSeq).toSet
        val got = joined.collect().map(_.toSeq).toSet
        assert(got == want, "bucketed join must return the same rows")
        assert(got.nonEmpty)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucket-count sizing: power of two, monotone, covers the bytes") {
    assert(BucketLayout.bucketsFor(1L, 128L << 20) == 1)
    assert(BucketLayout.bucketsFor(128L << 20, 128L << 20) == 1)
    assert(BucketLayout.bucketsFor((128L << 20) + 1, 128L << 20) == 2)
    assert(BucketLayout.bucketsFor(100L << 30, 128L << 20) == 1024)
    // power of two, and enough buckets for the bytes
    for (gb <- Seq(1L, 7L, 64L, 333L)) {
      val b = BucketLayout.bucketsFor(gb << 30, 128L << 20)
      assert((b & (b - 1)) == 0, s"$b not a power of two")
      assert(b.toLong * (128L << 20) >= (gb << 30))
    }
    // ADVICE r7: the 2^20 cap must hold for inputs ABOVE it (the old
    // pre-round-up clamp let these fall through to 2^21)
    assert(BucketLayout.bucketsFor((1L << 16) * (128L << 20), 128L << 20)
      == (1 << 16))
    assert(BucketLayout.bucketsFor(((1L << 16) + 1) * (128L << 20), 128L << 20)
      == (1 << 16))
    assert(BucketLayout.bucketsFor(Long.MaxValue / 2, 128L << 20) == (1 << 16))
  }
}
