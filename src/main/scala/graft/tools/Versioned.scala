package graft.tools

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader-atomic table promotion — the version-pointer protocol the
  * maintenance jobs ([[Compact]], [[Layout]]) publish through.
  *
  * [[Compact.run]]'s move-aside/promote swap has a documented window
  * where the table path does not exist, and a concurrent session
  * listing the directory mid-swap can see a partial file set. The
  * versioned layout closes that window the way every table format
  * (and the Artifacts manifest precedent in this repo) does: data is
  * IMMUTABLE once written under `dir/v<N>/`, and the only mutable
  * state is a one-line pointer file `dir/_graft_current` naming the
  * live version. A rewrite lands completely in `v<N+1>`, is verified,
  * and then the pointer flips via write-temp + single-file RENAME —
  * atomic on POSIX and HDFS (`FileContext.rename(OVERWRITE)` is the
  * Hadoop spelling of an atomic replace). A reader resolves the
  * pointer ONCE and scans that version directory: it sees wholly the
  * old version or wholly the new one, never a mix and never a missing
  * path.
  *
  * Version retention: after flipping to v(N+1), versions < N are
  * deleted — the immediately superseded v(N) survives one more
  * publish cycle so an in-flight reader that resolved just before the
  * flip finishes its scan against intact files. (At cluster scale
  * retention is driven by a TTL ≥ the longest query; one cycle is the
  * single-box equivalent and keeps disk bounded at ≤ 2 copies.)
  */
object Versioned {

  private val PointerName = "_graft_current"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def pointerPath(dir: String) = new Path(dir, PointerName)

  def versionDir(dir: String, v: Int): String =
    new Path(dir, s"v$v").toString

  /** The live version number, if `dir` uses the versioned layout. */
  def current(spark: SparkSession, dir: String): Option[Int] = {
    val ptr = pointerPath(dir)
    val fs = fsOf(spark, ptr)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val txt = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        Some(txt.toInt)
      } finally in.close()
    }
  }

  /** The directory a reader should scan: the live version dir if a
    * pointer exists, else the flat dir itself (pre-versioned tables
    * keep working unchanged). */
  def resolve(spark: SparkSession, dir: String): String =
    current(spark, dir).map(v => versionDir(dir, v)).getOrElse(dir)

  /** Open the live snapshot of a (possibly versioned) parquet table. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(resolve(spark, dir))

  /** Atomically flip the pointer to `v` (write temp + rename-replace),
    * then GC versions older than the one just superseded. */
  private def commit(spark: SparkSession, dir: String, v: Int): Unit = {
    val ptr = pointerPath(dir)
    val fs = fsOf(spark, ptr)
    val tmp = new Path(dir, s".${PointerName}_tmp_${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // FileContext.rename with OVERWRITE is the atomic single-file
    // replace (FileSystem.rename refuses an existing destination on
    // some implementations, and delete+rename would re-open a window)
    FileContext.getFileContext(ptr.toUri,
      spark.sparkContext.hadoopConfiguration)
      .rename(tmp, ptr, Options.Rename.OVERWRITE)
    // keep v-1 for in-flight readers; drop anything older — including
    // the pre-versioned FLAT data files, which count as "version 0"
    // and so are dropped once v2 lands. Staging debris for versions
    // STRICTLY BELOW v is also dead: a writer staging
    // `.staging/v<k>_tmp_*`, k < v, can never win its claim rename
    // (v<k> was superseded), so its leftovers are safe to GC here.
    // k == v staging dirs are NOT touched (ADVICE r10): one may be a
    // concurrent publisher still writing — it will lose its claim and
    // delete its own staging on the clean 'already landed' abort, and
    // deleting it mid-write here would turn that into an arbitrary IO
    // error. A CRASHED k == v attempt is GC'd by the next commit,
    // when k < v holds.
    fs.listStatus(new Path(dir)).foreach { st =>
      val n = st.getPath.getName
      val isOldVersion = n.startsWith("v") && n.drop(1).nonEmpty &&
        n.drop(1).forall(_.isDigit) && n.drop(1).toInt < v - 1
      val isFlatData = st.isFile && v - 1 > 0 &&
        (n.endsWith(".parquet") || n == "_SUCCESS" || n.endsWith(".crc"))
      if (isOldVersion || isFlatData)
        fs.delete(st.getPath, true)
    }
    val stagingRoot = new Path(dir, StagingDirName)
    if (fs.exists(stagingRoot))
      fs.listStatus(stagingRoot).foreach { st =>
        val isDeadStaging = StagingRe.findFirstMatchIn(st.getPath.getName)
          .exists(_.group(1).toInt < v)
        if (isDeadStaging) fs.delete(st.getPath, true)
      }
  }

  private val StagingDirName = ".staging"
  private val StagingRe = """^v(\d+)_tmp_.*""".r

  /** Publish a new version of `dir`: `writer` materializes the full
    * next-version directory, `verify` inspects it (count checks —
    * throw to abort with the live version untouched), then the
    * pointer flips atomically. Returns the published version. A flat
    * (pre-versioned) dir publishes v1 alongside its flat files; the
    * flat files stop being read once the pointer exists and are GC'd
    * two publishes later — they are never mutated, so flat readers
    * that predate the first publish stay safe too.
    *
    * Writer coordination (ADVICE r9): the writer stages into a
    * UUID-named temp dir, and claiming the version number is ONE
    * atomic directory rename (`tmp → v<N>`), which fails if another
    * publisher already landed v<N> — so two concurrent publishers
    * computing the same `next` can never interleave: exactly one
    * wins, the loser throws with the live pointer untouched, and
    * nobody ever deletes a directory another writer is filling (the
    * old delete-then-write cleared debris ANY concurrent writer might
    * still be producing). A crashed attempt's staging dir is GC'd by
    * the first commit that SUPERSEDES its version number (k < live;
    * same-version staging gets a grace window because it may be a
    * live concurrent publisher — ADVICE r10). */
  def publish(spark: SparkSession, dir: String)(
      writer: String => Unit)(verify: String => Unit = _ => ()): Int = {
    val next = current(spark, dir).getOrElse(0) + 1
    val target = new Path(versionDir(dir, next))
    val fs = fsOf(spark, target)
    // staging lives under a DOT-prefixed parent so a flat (pre-v1)
    // reader scanning `dir` never lists in-progress files, while the
    // staging dir's own leaf name stays visible — verify() can
    // spark.read it without tripping the hidden-path filter (the old
    // `.v<N>_tmp_*` flat siblings made every verify read log
    // "All paths were ignored")
    fs.mkdirs(new Path(dir, StagingDirName))
    val staging = new Path(new Path(dir, StagingDirName),
      s"v${next}_tmp_${java.util.UUID.randomUUID}")
    try {
      writer(staging.toString)
      verify(staging.toString)
      // the claim: one dir rename that REFUSES an existing
      // destination. FileSystem.rename has mv semantics (an existing
      // dst dir swallows src as a child); FileContext with
      // Rename.NONE is the Hadoop spelling of fail-if-exists.
      try FileContext.getFileContext(target.toUri,
          spark.sparkContext.hadoopConfiguration)
        .rename(staging, target, Options.Rename.NONE)
      catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"concurrent publisher already landed $target — aborting; " +
            "the winning version is live and this attempt wrote " +
            "nothing visible", e)
      }
    } catch {
      case t: Throwable => fs.delete(staging, true); throw t
    }
    commit(spark, dir, next)
    next
  }
}
