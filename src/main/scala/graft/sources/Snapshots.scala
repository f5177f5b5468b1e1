package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot publishing with an atomic pointer commit — the
  * minimal table-format core (the pattern Delta/Iceberg/Hive-ACID build
  * on): writers never mutate data a reader might be scanning; they write
  * a COMPLETE new version directory and then commit it by atomically
  * replacing a tiny pointer file. Readers resolve the pointer once at
  * plan time and scan an immutable directory, so there are no partial
  * reads, no torn listings, and time travel / instant rollback are free.
  *
  * Layout under `dir`:
  * {{{
  *   v=00001/ v=00002/ ...   immutable parquet version directories
  *   _LATEST                 the committed version number (atomic rename)
  *   _PINS/<name>            reader pins: versions vacuum must not touch
  * }}}
  *
  * Scale shape: the commit is O(1) regardless of table size — one rename
  * of a bytes-sized pointer (rename is atomic on HDFS-like filesystems;
  * an object store would use a conditional put of the same pointer key).
  * Old versions stay readable until [[vacuum]] reclaims them, which is
  * what makes long-running 100 TB readers safe against concurrent
  * publishes: a reader that resolved v=N keeps scanning v=N's files even
  * after v=N+1 commits. Single-writer by contract (a real lake format
  * adds a lock/CAS for writer-writer races; readers need none).
  */
object Snapshots {

  private val Pointer = "_LATEST"

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val f = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    (f, f.makeQualified(p))
  }

  private def versionDir(root: Path, v: Int): Path = new Path(root, f"v=$v%05d")

  /** Write `df` as the next version and commit it. Returns the new
    * version number. The data write lands in the (unreferenced) version
    * directory first; the pointer swap is the commit point — a crash
    * before it leaves the table at the previous version with only an
    * orphan directory to vacuum, never a torn table. */
  def publish(spark: SparkSession, dir: String, df: DataFrame): Int = {
    val (f, root) = fs(spark, dir)
    val v = nextVersion(spark, dir)
    df.write.mode("error").parquet(versionDir(root, v).toString)
    commitPointer(f, root, v)
    v
  }

  /** The committed version, if any. */
  def latestVersion(spark: SparkSession, dir: String): Option[Int] = {
    val (f, root) = fs(spark, dir)
    val ptr = new Path(root, Pointer)
    if (!f.exists(ptr)) None
    else {
      val buf = new Array[Byte](f.getFileStatus(ptr).getLen.toInt)
      val in = f.open(ptr)
      try { in.readFully(0, buf); Some(new String(buf, "UTF-8").trim.toInt) }
      finally in.close()
    }
  }

  /** Schema memo keyed by immutable version directory (r14, guide §7.3
    * driver overhead): a committed version's files never change (the
    * publish contract — writers only ever create NEW `v=` dirs), so its
    * parquet schema is a constant; without the memo EVERY
    * `spark.read.parquet` of a version pays a 1-task footer-inference
    * JOB, and the versioned-index/summary gates schedule 20+ such jobs
    * per lifecycle (measured as a dominant driver-gap component).
    * Metadata only — row data is never cached; the existence `require`
    * in [[readVersion]] still guards vacuumed versions. */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** Read a pinned version — time travel. */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val (f, root) = fs(spark, dir)
    val p = versionDir(root, v)
    require(f.exists(p), s"snapshot version $v does not exist under $dir")
    val cached = schemaMemo.get(p.toString)
    if (cached != null) spark.read.schema(cached).parquet(p.toString)
    else {
      val df = spark.read.parquet(p.toString)
      if (schemaMemo.size > 1024) schemaMemo.clear() // bound the memo
      schemaMemo.putIfAbsent(p.toString, df.schema)
      df
    }
  }

  /** Read the committed version (resolved ONCE, here — the returned frame
    * keeps scanning that version even if a publish lands mid-query). */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $dir"))
    readVersion(spark, dir, v)
  }

  /** Point the table back at an existing older version — O(1), data
    * untouched. The abandoned newer versions remain readable (and
    * re-publishable over: [[publish]] always allocates max+1 of the
    * DIRECTORIES present, so a rolled-back version is never overwritten). */
  def rollback(spark: SparkSession, dir: String, v: Int): Unit = {
    val (f, root) = fs(spark, dir)
    require(f.exists(versionDir(root, v)), s"cannot roll back to missing version $v")
    commitPointer(f, root, v)
  }

  /** All version numbers present on disk (committed or orphaned), ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (f, root) = fs(spark, dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toInt).sorted
  }

  /** Delete all versions strictly older than the newest `keepLast` —
    * never the committed one, and never a [[pin]]ned one. Returns the
    * versions deleted. Readers that outlive the retention window MUST
    * register via [[pin]] before resolving their version; unpinned
    * readers are only safe within the newest `keepLast`. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val (f, root) = fs(spark, dir)
    val all = versions(spark, dir)
    val current = latestVersion(spark, dir)
    val keep = all.takeRight(keepLast).toSet ++ current ++
      pinnedVersions(spark, dir).values
    val drop = all.filterNot(keep)
    drop.foreach(v => f.delete(versionDir(root, v), true))
    drop
  }

  private val PinsDir = "_PINS"

  private def pinName(name: String): String = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"pin name must be [A-Za-z0-9._-]+: '$name'")
    name
  }

  /** Register a named pin on version `v`: [[vacuum]] will never delete a
    * pinned version, so a long-running reader (a multi-day training job
    * scanning one snapshot of a 100 TB table) pins BEFORE resolving and
    * [[unpin]]s when done — the lock-free reader contract extended past
    * the retention window. Pin creation is a one-file write under
    * `_PINS/`; re-pinning an existing name moves it. The pin file commits
    * by the same tmp+atomic-rename protocol as the `_LATEST` pointer: a
    * [[vacuum]] listing `_PINS/` concurrently with registration must see
    * either no pin or the complete pin — never an empty or truncated
    * file, which would abort the vacuum (or worse, pin the wrong
    * version while the reader's intended one gets deleted). */
  def pin(spark: SparkSession, dir: String, v: Int, name: String): Unit = {
    val (f, root) = fs(spark, dir)
    require(f.exists(versionDir(root, v)), s"cannot pin missing version $v")
    val pins = new Path(root, PinsDir)
    f.mkdirs(pins)
    val tmp = new Path(pins, s".${pinName(name)}.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, f.getConf)
    fc.rename(tmp, new Path(pins, pinName(name)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Remove a named pin (idempotent — a finished reader's cleanup must
    * not fail if the pin is already gone). */
  def unpin(spark: SparkSession, dir: String, name: String): Unit = {
    val (f, root) = fs(spark, dir)
    f.delete(new Path(new Path(root, PinsDir), pinName(name)), false)
  }

  /** All registered pins, name → version. In-flight `.name.tmp` files
    * from a concurrent [[pin]] (or a crash before its rename) are not
    * pins and are skipped; a COMMITTED pin that doesn't parse is a hard
    * error with the offending path named — silently ignoring it would
    * let [[vacuum]] delete the version that reader intended to hold. */
  def pinnedVersions(spark: SparkSession, dir: String): Map[String, Int] = {
    val (f, root) = fs(spark, dir)
    val pins = new Path(root, PinsDir)
    if (!f.exists(pins)) Map.empty
    else f.listStatus(pins).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .map { st =>
        val buf = new Array[Byte](st.getLen.toInt)
        val in = f.open(st.getPath)
        try { in.readFully(0, buf) } finally in.close()
        val txt = new String(buf, "UTF-8").trim
        val v = try txt.toInt catch {
          case _: NumberFormatException => throw new IllegalStateException(
            s"unparsable pin file ${st.getPath} (content '${txt.take(40)}') — " +
              "refusing to vacuum/resolve against a corrupt pin registry")
        }
        st.getPath.getName -> v
      }.toMap
  }

  private def commitPointer(f: FileSystem, root: Path, v: Int): Unit = {
    f.mkdirs(root)
    val tmp = new Path(root, s".$Pointer.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(root, Pointer)
    // ATOMIC overwrite rename (FileContext supports Rename.OVERWRITE where
    // FileSystem.rename does not): a delete-then-rename pair would leave a
    // window with NO pointer on disk, during which a concurrent reader —
    // promised lock-freedom in the class contract — would see a missing
    // table, and a crash inside the window would strand it that way.
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, f.getConf)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** `publish` always allocates past every DIRECTORY on disk, not just the
    * committed pointer — so publish-after-rollback never overwrites the
    * rolled-back-from version. (Kept private-free for the spec.) */
  private[sources] def nextVersion(spark: SparkSession, dir: String): Int =
    (versions(spark, dir) :+ latestVersion(spark, dir).getOrElse(0)).max + 1
}
