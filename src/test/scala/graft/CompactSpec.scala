package graft

import graft.tools.Compact
import org.apache.spark.sql.functions._

/** Small-file compaction: fewer files, identical content, safe swap. */
class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks file count, preserves content, survives re-read") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // land a deliberately fragmented table: 40 files for ~40k tiny rows
    val src = spark.range(40000)
      .select($"id", md5($"id".cast("string")).as("payload"))
    src.repartition(40).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(conv(substring($"payload", 1, 8), 16, 10).cast("long")),
        count(lit(1))).head()

    val (before, after, rows) = Compact.run(spark, dir, targetBytes = 1L << 20)
    assert(rows === 40000L)
    assert(before === 40)
    assert(after < before, s"expected fewer files, got $before -> $after")

    val re = spark.read.parquet(dir)
    val checksumAfter = re
      .agg(sum(conv(substring($"payload", 1, 8), 16, 10).cast("long")),
        count(lit(1))).head()
    assert(checksumAfter === checksumBefore, "content must be preserved")
    // no temp/old residue next to the table
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().forall(!_.getName.contains("_compact_")),
      "swap must clean up its temp directories")
  }
}
