package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Multi-table atomic publish via a version-pointer layout (SURVEY S5).
  *
  * The reference wraps BOTH table loads in one MySQL transaction
  * (etl/03_transform_and_load.py:120-172): a reader never sees new
  * `companies` next to old `charges`. [[Lake.promoteStaging]] makes each
  * single table's swap crash-safe, but two sequential swaps still
  * expose a mixed state to a crash between them. This layout closes
  * that gap without an ACID table format:
  *
  * {{{
  * base/
  *   _v/00000001 00000002 …   # empty marker files; commit points
  *   v1/companies/ v1/charges/  # immutable per-version data dirs
  *   v2/companies/ v2/charges/
  * }}}
  *
  * The current version is the highest-numbered marker. A publish writes
  * EVERY table under the next version dir, verifies each Spark
  * `_SUCCESS`, then commits with one atomic `createNewFile` of the
  * marker — the multi-table equivalent of the reference's COMMIT. A
  * crash anywhere before the marker leaves readers on the old version
  * with all its tables; a crash after it leaves them on the new one.
  * No recovery routine is ever required on the read path — uncommitted
  * version dirs are invisible and get cleaned by the next publish.
  *
  * Readers resolve the version once per query ([[read]]), so a single
  * query is always served by one consistent version. GC keeps the
  * current AND previous versions on disk, so a reader that resolved
  * just before a publish still has its files for a full publish cycle.
  *
  * Single-writer by design (like the reference's one ETL process),
  * and ENFORCED: a publish first takes an exclusive per-version claim
  * (`_v/claim-N`, atomic `createNewFile`), so of two racing publishers
  * exactly one proceeds and the loser errors before writing a byte —
  * never last-write-wins, never a shared data dir. A crashed publisher
  * leaves its claim behind; the next publish fails with a message
  * naming the claim file to remove (loud manual recovery beats a
  * timeout heuristic that could break exclusivity under a slow writer).
  */
object Versioned {

  /** One table in a publish: the frame plus its physical layout.
    * `partitionBy` gives facts the date-partitioned layout
    * ([[Lake.writeDatePartitioned]] semantics) inside the version. */
  final case class TableSpec(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil)

  private def markerDir(base: Path) = new Path(base, "_v")
  private def versionDir(base: Path, v: Long) = new Path(base, s"v$v")
  private def fmt(v: Long): String = f"$v%08d"

  private def fs(spark: SparkSession, base: Path): FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, if any publish ever committed. */
  def currentVersion(spark: SparkSession, base: String): Option[Long] = {
    val b = new Path(base)
    val f = fs(spark, b)
    if (!f.exists(markerDir(b))) None
    else f.listStatus(markerDir(b)).toSeq
      .flatMap(s => s.getPath.getName.toLongOption)
      .maxOption
  }

  /** Read `table` at the current version. One resolve per call: a plan
    * built from this frame reads one consistent version throughout. */
  def read(spark: SparkSession, base: String, table: String): DataFrame = {
    val v = currentVersion(spark, base)
      .getOrElse(sys.error(s"versioned lake $base has no committed version"))
    readAt(spark, base, table, v)
  }

  /** Time travel: read `table` as of a specific committed `version`.
    * GC keeps the current and previous versions on disk, so the
    * previous version is always readable (the in-flight-reader grace
    * window doubles as one step of history); older versions fail with
    * the GC explanation rather than a bare missing-path error. */
  def readAt(spark: SparkSession, base: String, table: String,
      version: Long): DataFrame = {
    val b = new Path(base)
    val f = fs(spark, b)
    if (!f.exists(new Path(markerDir(b), fmt(version)))) {
      val cur = currentVersion(spark, base)
      sys.error(s"versioned lake $base has no committed version $version" +
        cur.fold("")(c => s" (current is $c; versions older than ${c - 1} " +
          "are garbage-collected — raise retention by publishing less often " +
          "or snapshot externally)"))
    }
    spark.read.parquet(new Path(versionDir(b, version), table).toString)
  }

  /** Whether `table` was published (with a completed write) at
    * `version` — publishes declare their table set, so an optional
    * table (e.g. a change-data table) is probed, not assumed. */
  def tableExists(spark: SparkSession, base: String, table: String,
      version: Long): Boolean = {
    val b = new Path(base)
    val f = fs(spark, b)
    f.exists(new Path(markerDir(b), fmt(version))) &&
      f.exists(new Path(new Path(versionDir(b, version), table), "_SUCCESS"))
  }

  /** All committed versions still on disk, ascending. */
  def listVersions(spark: SparkSession, base: String): Seq[Long] = {
    val b = new Path(base)
    val f = fs(spark, b)
    if (!f.exists(markerDir(b))) Seq.empty
    else f.listStatus(markerDir(b)).toSeq
      .flatMap(s => s.getPath.getName.toLongOption).sorted
  }

  /** Tables published (with completed writes) at `version`. */
  def listTables(spark: SparkSession, base: String, version: Long)
      : Seq[String] = {
    val b = new Path(base)
    val f = fs(spark, b)
    val vdir = versionDir(b, version)
    if (!f.exists(vdir)) Seq.empty
    else f.listStatus(vdir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(t => f.exists(new Path(new Path(vdir, t), "_SUCCESS")))
      .sorted
  }

  /** MERGE-style publish: the next version is the current one with
    * `delta` UPSERTED into `table` — rows matching on `keys` replaced,
    * unmatched rows appended — and every other table carried forward
    * unchanged. Runs through [[publish]], so it inherits the claim
    * protocol (two racing mergers: exactly one wins) and the
    * all-or-nothing marker commit: a reader never sees half a merge.
    *
    * Schema EVOLUTION rides the union: a delta with new columns
    * widens the table (old rows read null in the new columns —
    * `unionByName(allowMissingColumns)`), while time travel keeps
    * each version's own schema: `readAt(v−1)` still serves the
    * pre-evolution shape from its immutable dir.
    *
    * Cost model, stated honestly: carry-forward REWRITES unchanged
    * tables into the new version dir — the price of dirt-simple
    * reader semantics (a version is a self-contained dir). A manifest
    * format (Delta/Iceberg) shares unchanged files between versions
    * instead; at 100 TB you would either adopt one or partition the
    * versioned tables so carry-forward is a metadata-cheap file copy.
    * The merge itself is one anti-join (key-hashed shuffle) + union —
    * the reference's upsert economics (03_transform_and_load.py:
    * 134-156) relationally. */
  def mergePublish(spark: SparkSession, base: String, table: String,
      delta: DataFrame, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "merge needs at least one key column")
    // MERGE semantics require unique source keys: a duplicate-keyed
    // delta (a retried extractor emitting the same row twice) would
    // anti-join away the one current row and append BOTH copies —
    // a silently duplicated primary key. SQL MERGE errors on multiple
    // matches; so do we, before writing a byte. One aggregation over
    // the (small) delta; a caller wanting last-wins dedups explicitly.
    // the aggregate gets a collision-proof alias: a key column named
    // `count` would make a bare .count()/filter("count") ambiguous
    val dupKeys = delta
      .groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("__graft_dup_n"))
      .filter(org.apache.spark.sql.functions.col("__graft_dup_n") > 1)
      .count()
    require(dupKeys == 0,
      s"mergePublish: delta carries $dupKeys duplicated key group(s) on " +
        s"(${keys.mkString(", ")}) — MERGE requires unique source keys; " +
        "dedup the delta (or choose last-wins explicitly) first")
    val cur = currentVersion(spark, base).getOrElse(
      sys.error(s"mergePublish: $base has no committed version to merge into"))
    val existing = listTables(spark, base, cur)
    require(existing.contains(table),
      s"mergePublish: table $table not in version $cur (has: $existing)")
    val specs = existing.map { t =>
      if (t == table) {
        val current = readAt(spark, base, t, cur)
        val merged = current
          .join(delta.select(keys.map(org.apache.spark.sql.functions.col): _*),
            keys, "left_anti")
          .unionByName(delta, allowMissingColumns = true)
        TableSpec(t, merged)
      } else TableSpec(t, readAt(spark, base, t, cur))
    }
    publish(spark, base, specs)
  }

  /** OPTIMIZE-style compaction publish: the next version carries the
    * SAME logical content, with `table` physically rewritten into at
    * most `files` range-partitioned files sorted by `sortBy` within
    * each file, and every other table carried forward. The
    * small-file/layout maintenance op of an ingest lake: streaming and
    * merge publishes accrete writer-count-sized files with no useful
    * ordering; this rewrite (a) caps the file count — at 100 TB the
    * scheduler and the namenode care long before the scanner does —
    * and (b) clusters the sort keys so parquet row-group min/max
    * statistics actually prune: a range predicate on a sort column
    * skips whole row groups (and with range-partitioned files, whole
    * files) instead of reading everything and filtering in memory.
    * Runs through [[publish]] ⇒ claim protocol + atomic marker + time
    * travel to the pre-compaction layout all apply; value-identity is
    * the caller's oracle to check (and [[VersionedLakeSpec]] does).
    *
    * `repartitionByRange` samples the sort keys to build balanced
    * range bounds — one extra pass over `table`, which is the honest
    * cost of a compaction anywhere; skew in the sort key lands in
    * bounded-width ranges rather than hot hash buckets. */
  def compactPublish(spark: SparkSession, base: String, table: String,
      sortBy: Seq[String], files: Int): Long = {
    import org.apache.spark.sql.functions.col
    require(sortBy.nonEmpty && files >= 1, "compact needs sort columns and files >= 1")
    val cur = currentVersion(spark, base).getOrElse(
      sys.error(s"compactPublish: $base has no committed version"))
    val existing = listTables(spark, base, cur)
    require(existing.contains(table),
      s"compactPublish: table $table not in version $cur (has: $existing)")
    val specs = existing.map { t =>
      if (t == table) TableSpec(t,
        readAt(spark, base, t, cur)
          .repartitionByRange(files, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*))
      else TableSpec(t, readAt(spark, base, t, cur))
    }
    publish(spark, base, specs)
  }

  /** Atomically publish all `tables` as one new version. Returns the
    * committed version number. All-or-nothing: either the marker lands
    * and every table is visible at the new version, or no reader ever
    * sees any of this publish's data. */
  def publish(spark: SparkSession, base: String,
      tables: Seq[TableSpec]): Long = {
    require(tables.nonEmpty, "publish needs at least one table")
    val b = new Path(base)
    val f = fs(spark, b)
    val cur = currentVersion(spark, base).getOrElse(0L)
    val next = cur + 1
    val vdir = versionDir(b, next)
    val marker = new Path(markerDir(b), fmt(next))
    val claim = new Path(markerDir(b), s"claim-${fmt(next)}")

    // CLAIM: exclusive ownership of `next` BEFORE touching its data
    // dir. The commit marker alone is not enough — two racers sharing
    // v$next would let the marker-race loser overwrite the winner's
    // just-committed data dir before failing. Serializing on an atomic
    // createNewFile up front means the loser errors before writing a
    // byte. A claim with no matching marker survives a crashed
    // publisher; that wedges the next publish LOUDLY (message below)
    // rather than silently breaking exclusivity with a timeout guess.
    f.mkdirs(markerDir(b))
    if (!f.createNewFile(claim)) {
      if (f.exists(marker))
        sys.error(s"publish: version $next already committed by another " +
          "writer — re-resolve the current version and retry")
      else
        sys.error(s"publish: version $next is claimed by an in-flight " +
          s"publisher (or a crashed one — remove $claim to recover)")
    }
    if (f.exists(marker) || currentVersion(spark, base).getOrElse(0L) != cur) {
      // stale read: someone committed between our resolve and our claim
      f.delete(claim, false)
      sys.error(s"publish: version advanced past $cur during claim — retry")
    }
    // leftover from a crashed earlier attempt at this same version —
    // uncommitted (no marker), so deleting it is invisible to readers
    f.delete(vdir, true)

    tables.foreach { t =>
      val dst = new Path(vdir, t.name).toString
      if (t.partitionBy.isEmpty)
        t.df.write.mode(SaveMode.Overwrite)
          .option("compression", "zstd").parquet(dst)
      else t.df // one writer set per partition dir (no small files)
        .repartition(t.partitionBy.map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite).option("compression", "zstd")
        .partitionBy(t.partitionBy: _*).parquet(dst)
    }
    tables.foreach { t =>
      if (!f.exists(new Path(new Path(vdir, t.name), "_SUCCESS")))
        sys.error(s"publish: ${t.name} has no _SUCCESS under $vdir — aborting uncommitted")
    }

    // COMMIT: one atomic create. With the claim held this cannot lose
    // a race; a false here means external interference — fail loudly.
    if (!f.createNewFile(marker))
      sys.error(s"publish: version $next already committed by another writer")

    // GC everything older than the previous version (kept as the
    // in-flight-reader grace copy). Marker first: once it's gone the
    // version can no longer be resolved, so deleting its dir is safe.
    // Claims of GC'd versions go with them; recent claims stay, so a
    // publisher holding a stale `cur` fails its claim instead of
    // deleting committed data.
    if (f.exists(markerDir(b)))
      f.listStatus(markerDir(b)).toSeq
        .flatMap(s => s.getPath.getName.toLongOption)
        .filter(_ < next - 1)
        .foreach { v =>
          f.delete(new Path(markerDir(b), fmt(v)), false)
          f.delete(new Path(markerDir(b), s"claim-${fmt(v)}"), false)
          f.delete(versionDir(b, v), true)
        }
    next
  }
}
