package graft.tools

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance pass every long-lived
  * 100 TB table needs: streaming sinks and incremental batch appends
  * land thousands of KB-sized parquet files per day, and scan
  * planning, footer reads, and shuffle-fetch overheads degrade
  * linearly in file COUNT even when total bytes are constant.
  *
  * `run` rewrites one dataset directory to ~`targetBytes` files:
  * partition count = ceil(inputBytes / targetBytes) (inputBytes from
  * the file system, not a data scan), `repartition(n)` for even
  * output sizes, then an atomic swap via a sibling temp dir + rename
  * so readers never observe a half-written table. Ordering is not
  * preserved — parquet tables are unordered by contract here (every
  * registry query orders explicitly or is order-free).
  *
  * At cluster scale the same routine runs per partition directory
  * (dt=.../hour=...) under a metastore lock or a table format's
  * transaction; the single-dir core is what this exercises.
  */
object Compact {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: Compact <datasetDir> [targetBytes]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val (before, after, rows) =
      run(spark, args(0), args.lift(1).map(_.toLong).getOrElse(128L << 20))
    println(s"[compact] files $before -> $after ($rows rows)")
    spark.stop()
  }

  /** Returns (filesBefore, filesAfter, rowCount). */
  def run(spark: SparkSession, dir: String,
      targetBytes: Long): (Int, Int, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(path).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}_compact_tmp")
    fs.delete(tmp, true)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    df.repartition(n).write.parquet(tmp.toString)
    // atomic-ish swap: move the old dir aside, promote, then clean up
    val old = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}_compact_old")
    fs.delete(old, true)
    require(fs.rename(path, old), s"could not move $path aside")
    require(fs.rename(tmp, path), s"could not promote $tmp")
    fs.delete(old, true)
    (before.size, dataFiles().size, rows)
  }
}
