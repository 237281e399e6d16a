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

  test("a run that died inside the swap window is restored on the next run") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    spark.range(1000).select($"id").repartition(8).write.parquet(dir)
    // simulate a crash between rename(path→old) and rename(tmp→path):
    // the table path is gone, the data sits in the hidden old dir
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}_compact_old")
    require(fs.rename(path, old))
    assert(!fs.exists(path) && fs.exists(old))

    val (before, after, rows) = Compact.run(spark, dir, targetBytes = 1L << 20)
    assert(rows === 1000L, "recovery must restore the stranded original")
    assert(after <= before)
    assert(spark.read.parquet(dir).count() === 1000L)
    assert(!fs.exists(old), "recovered old dir must be cleaned up")
  }

  test("stale old dir next to an intact table is cleared, not restored") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    spark.range(500).select($"id").repartition(4).write.parquet(dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}_compact_old")
    // superseded copy left behind by a crash after promote
    spark.range(99).write.parquet(old.toString)

    val (_, _, rows) = Compact.run(spark, dir, targetBytes = 1L << 20)
    assert(rows === 500L, "the intact table wins over the stale copy")
    assert(spark.read.parquet(dir).count() === 500L)
    assert(!fs.exists(old))
  }
}
