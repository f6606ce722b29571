package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Multi-table atomic publish via a version-manifest layout (SURVEY S5).
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
  *   _v/00000001 00000002 …      # empty marker files; commit points
  *   _data/charges-00000001/     # immutable parquet dirs, named by the
  *   _data/companies-00000002/   #   version whose publish WROTE them
  *   v1/charges.ref v1/companies.ref   # manifest: table → data dir
  *   v2/charges.ref v2/companies.ref
  * }}}
  *
  * A version is a MANIFEST — one tiny `.ref` file per table naming the
  * base-relative data dir that holds its rows (the Delta/Iceberg
  * indirection, reduced to its essence). A publish writes data dirs
  * only for tables that actually changed; carried-forward tables get a
  * ref pointing at the SAME immutable data dir the previous version
  * used. That is what makes [[mergePublish]] affordable at 100 TB: a
  * daily merge into one table writes that table's bytes, never the
  * lake's — unchanged tables are shared by pointer, not rewritten.
  *
  * The current version is the highest-numbered marker. A publish
  * writes every changed table's data dir, verifies each Spark
  * `_SUCCESS`, writes the manifest refs, then commits with one atomic
  * `createNewFile` of the marker — the multi-table equivalent of the
  * reference's COMMIT. A crash anywhere before the marker leaves
  * readers on the old version with all its tables; a crash after it
  * leaves them on the new one. No recovery routine is ever required on
  * the read path — uncommitted version dirs and orphaned data dirs are
  * invisible and get collected by a later publish's GC.
  *
  * Readers resolve the version once per query ([[read]]), so a single
  * query is always served by one consistent version. GC keeps the
  * current AND previous version manifests, and REFCOUNTS data dirs:
  * a data dir is deleted only when no surviving manifest references it
  * — versions sharing a table's files never tear each other down, and
  * a reader that resolved just before a publish still has its files
  * for a full publish cycle.
  *
  * Single-writer by design (like the reference's one ETL process),
  * and ENFORCED: a publish first takes an exclusive per-version claim
  * (`_v/claim-N`, atomic `createNewFile`), so of two racing publishers
  * exactly one proceeds and the loser errors before writing a byte —
  * never last-write-wins, never a shared data dir. A crashed publisher
  * leaves its claim behind; the next publish fails with a message
  * naming the claim file to remove (loud manual recovery beats a
  * timeout heuristic that could break exclusivity under a slow writer).
  *
  * Pre-manifest lakes (a self-contained `v$N/<table>/` dir per
  * version) stay readable: resolution falls back to the in-version
  * table dir when no ref file exists, and the first manifest publish
  * over such a lake rewrites carried tables once (old version dirs are
  * not refcounted — sharing starts at the first manifest version).
  */
object Versioned {

  /** One table in a publish: the frame plus its physical layout.
    * `partitionBy` gives facts the date-partitioned layout
    * ([[Lake.writeDatePartitioned]] semantics) inside the version.
    * `statsCols` declares zone-map columns: the publish distills the
    * written files' parquet footer min/max into a [[ZoneMaps]] sidecar
    * inside the data dir, enabling manifest-level file skipping via
    * [[Versioned.readPruned]]. Must be DATA columns — naming a
    * partition column (dir-encoded, absent from footers) fails the
    * publish loudly. */
  final case class TableSpec(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, statsCols: Seq[String] = Nil)

  private def markerDir(base: Path) = new Path(base, "_v")
  private def versionDir(base: Path, v: Long) = new Path(base, s"v$v")
  private def dataRoot(base: Path) = new Path(base, "_data")
  private def fmt(v: Long): String = f"$v%08d"

  private def fs(spark: SparkSession, base: Path): FileSystem =
    base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Base-relative data-dir name for `table` as written at `v`. */
  private def dataDirName(table: String, v: Long): String =
    s"_data/$table-${fmt(v)}"

  private def refFile(base: Path, v: Long, table: String): Path =
    new Path(versionDir(base, v), s"$table.ref")

  private def writeRef(f: FileSystem, base: Path, v: Long, table: String,
      dataDir: String): Unit = {
    val out = f.create(refFile(base, v, table), true)
    try out.write(dataDir.getBytes("UTF-8")) finally out.close()
  }

  private def readRef(f: FileSystem, base: Path, v: Long, table: String)
      : Option[String] = {
    val p = refFile(base, v, table)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        Some(new String(bytes, "UTF-8").trim)
      } finally in.close()
    }
  }

  /** The base-relative data location serving `table` at `version`:
    * the manifest ref when present, the pre-manifest in-version dir
    * as fallback. None ⇒ the table is not part of that version. */
  private def resolveData(f: FileSystem, base: Path, table: String,
      version: Long): Option[String] =
    readRef(f, base, version, table).orElse {
      val legacy = new Path(versionDir(base, version), table)
      if (f.exists(new Path(legacy, "_SUCCESS"))) Some(s"v$version/$table")
      else None
    }

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
    * GC keeps the current and previous version manifests (and every
    * data dir they reference), so the previous version is always
    * readable (the in-flight-reader grace window doubles as one step
    * of history); older versions fail with the GC explanation rather
    * than a bare missing-path error. */
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
    val rel = resolveData(f, b, table, version).getOrElse(
      sys.error(s"versioned lake $base version $version has no table $table"))
    spark.read.parquet(new Path(b, rel).toString)
  }

  /** Data-dir path of `table` at `version` (manifest-resolved). */
  private def dataDirAt(spark: SparkSession, base: String, table: String,
      version: Long): String = {
    val b = new Path(base)
    val f = fs(spark, b)
    val rel = resolveData(f, b, table, version).getOrElse(
      sys.error(s"versioned lake $base version $version has no table $table"))
    new Path(b, rel).toString
  }

  /** Zone-map columns tracked by `table`'s data dir at `version`
    * (empty when the dir has no sidecar). */
  def statsColsAt(spark: SparkSession, base: String, table: String,
      version: Long): Seq[String] =
    ZoneMaps.sidecarCols(spark, dataDirAt(spark, base, table, version))

  /** Range read with manifest-level file skipping: rows of `table` at
    * the current version with `colName ∈ [lo, hi]`. When the data dir
    * carries a [[ZoneMaps]] sidecar tracking `colName`, only files
    * whose bounds intersect the range are handed to Spark — planning
    * and I/O ∝ matching files — and the predicate is STILL applied to
    * every surviving row, so the answer is exact whether or not
    * pruning engaged (missing sidecar / untracked column / legacy
    * layout ⇒ full scan + filter, same rows). `lo`/`hi` are Scala
    * values matching the column type (integer kinds, floating kinds,
    * or String). */
  def readPruned(spark: SparkSession, base: String, table: String,
      colName: String, lo: Any, hi: Any): DataFrame = {
    val v = currentVersion(spark, base)
      .getOrElse(sys.error(s"versioned lake $base has no committed version"))
    readPrunedAt(spark, base, table, v, colName, lo, hi)
  }

  /** [[readPruned]] with time travel. */
  def readPrunedAt(spark: SparkSession, base: String, table: String,
      version: Long, colName: String, lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val pred = col(colName) >= lit(lo) && col(colName) <= lit(hi)
    prunedFilesAt(spark, base, table, version, colName, lo, hi) match {
      case None => readAt(spark, base, table, version).filter(pred)
      case Some((dataDir, Nil, _)) =>
        // statistics prove no file can match: empty frame, table schema
        val schema = spark.read.parquet(dataDir).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some((dataDir, files, _)) =>
        spark.read
          .option("basePath", dataDir) // keep partition-dir columns
          .parquet(files.map(fl => new Path(dataDir, fl).toString): _*)
          .filter(pred)
    }
  }

  /** Pruning decision for a range probe, exposed for specs and ops
    * introspection: (data dir, selected file paths, total file count),
    * or None when no sidecar tracks `colName` (full scan). */
  def prunedFilesAt(spark: SparkSession, base: String, table: String,
      version: Long, colName: String, lo: Any, hi: Any)
      : Option[(String, Seq[String], Int)] = {
    val dataDir = dataDirAt(spark, base, table, version)
    for {
      stats <- ZoneMaps.readSidecar(spark, dataDir)
      selected <- ZoneMaps.selectFiles(stats, colName, lo, hi)
    } yield (dataDir, selected, stats.size)
  }

  /** Whether `table` was published (with a completed write) at
    * `version` — publishes declare their table set, so an optional
    * table (e.g. a change-data table) is probed, not assumed. */
  def tableExists(spark: SparkSession, base: String, table: String,
      version: Long): Boolean = {
    val b = new Path(base)
    val f = fs(spark, b)
    f.exists(new Path(markerDir(b), fmt(version))) &&
      resolveData(f, b, table, version)
        .exists(rel => f.exists(new Path(new Path(b, rel), "_SUCCESS")))
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
    else {
      val viaRef = f.listStatus(vdir).toSeq.filter(_.isFile)
        .map(_.getPath.getName).filter(_.endsWith(".ref"))
        .map(_.stripSuffix(".ref"))
      val legacy = f.listStatus(vdir).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(t => f.exists(new Path(new Path(vdir, t), "_SUCCESS")))
      (viaRef ++ legacy).distinct.sorted
    }
  }

  /** The physical files currently serving `table` at `version` — the
    * observable behind the manifest's sharing claim: two versions that
    * carry a table forward list the IDENTICAL paths. Spec surface and
    * operational probe (a backup tool wants exactly this list). */
  def tableFiles(spark: SparkSession, base: String, table: String,
      version: Long): Seq[String] = {
    val b = new Path(base)
    val f = fs(spark, b)
    val rel = resolveData(f, b, table, version).getOrElse(
      sys.error(s"versioned lake $base version $version has no table $table"))
    val dir = new Path(b, rel)
    def walk(p: Path): Seq[String] =
      f.listStatus(p).toSeq.flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else if (s.getPath.getName.endsWith(".parquet"))
          Seq(s.getPath.toString)
        else Seq.empty
      }
    walk(dir).sorted
  }

  /** MERGE-style publish: the next version is the current one with
    * `delta` UPSERTED into `table` — rows matching on `keys` replaced,
    * unmatched rows appended — and every other table carried forward
    * unchanged BY REFERENCE (its manifest ref repeats the previous
    * version's data dir; zero bytes rewritten). Runs through
    * [[publish]], so it inherits the claim protocol (two racing
    * mergers: exactly one wins) and the all-or-nothing marker commit:
    * a reader never sees half a merge.
    *
    * Schema EVOLUTION rides the union: a delta with new columns
    * widens the table (old rows read null in the new columns —
    * `unionByName(allowMissingColumns)`), while time travel keeps
    * each version's own schema: `readAt(v−1)` still serves the
    * pre-evolution shape from its immutable dir.
    *
    * Cost model: bytes written ∝ the MERGED table (current rows minus
    * replaced, plus the delta) — the reference's upsert economics
    * (03_transform_and_load.py:134-156) relationally, now with the
    * manifest making every untouched table a metadata-only carry. The
    * merge itself is one anti-join (key-hashed shuffle) + union. */
  def mergePublish(spark: SparkSession, base: String, table: String,
      delta: DataFrame, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "merge needs at least one key column")
    // MERGE semantics require unique source keys: a duplicate-keyed
    // delta (a retried extractor emitting the same row twice) would
    // anti-join away the one current row and append BOTH copies —
    // a silently duplicated primary key. SQL MERGE errors on multiple
    // matches; so do we, before writing a byte. One aggregation over
    // the (small) delta; a caller wanting last-wins dedups explicitly.
    // The aggregate gets a collision-proof alias: a key column named
    // `count` would make a bare .count()/filter("count") ambiguous.
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
    val current = readAt(spark, base, table, cur)
    val merged = current
      .join(delta.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti")
      .unionByName(delta, allowMissingColumns = true)
    // zone maps survive maintenance: if the current data dir declared
    // stats columns, the merged rewrite re-collects the same ones
    publish(spark, base, Seq(TableSpec(table, merged,
        statsCols = statsColsAt(spark, base, table, cur))),
      carry = existing.filterNot(_ == table))
  }

  /** OPTIMIZE-style compaction publish: the next version carries the
    * SAME logical content, with `table` physically rewritten into at
    * most `files` range-partitioned files sorted by `sortBy` within
    * each file, and every other table carried forward by reference.
    * The small-file/layout maintenance op of an ingest lake: streaming
    * and merge publishes accrete writer-count-sized files with no
    * useful ordering; this rewrite (a) caps the file count — at 100 TB
    * the scheduler and the namenode care long before the scanner does
    * — and (b) clusters the sort keys so parquet row-group min/max
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
    // the compacted layout is exactly what zone maps want (disjoint
    // sort-key ranges per file) — collect bounds for the sort columns
    // plus whatever the prior sidecar tracked
    publish(spark, base, Seq(TableSpec(table,
      readAt(spark, base, table, cur)
        .repartitionByRange(files, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*),
      statsCols =
        (sortBy ++ statsColsAt(spark, base, table, cur)).distinct)),
      carry = existing.filterNot(_ == table))
  }

  /** Atomically publish a new version: every table in `tables` is
    * written as a fresh immutable data dir; every table named in
    * `carry` is carried forward from the current version BY REFERENCE
    * — its manifest ref repeats the current version's data dir, so
    * carry-forward costs one tiny file, not a table rewrite. (A
    * carried table whose current version predates the manifest layout
    * is rewritten once — old self-contained version dirs are not
    * refcounted.) Returns the committed version number. All-or-
    * nothing: either the marker lands and every table is visible at
    * the new version, or no reader ever sees any of this publish's
    * data. */
  def publish(spark: SparkSession, base: String,
      tables: Seq[TableSpec], carry: Seq[String] = Nil): Long = {
    require(tables.nonEmpty, "publish needs at least one table")
    require(tables.map(_.name).intersect(carry).isEmpty,
      "a table cannot be both written and carried")
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
    // carried tables resolve against the CURRENT manifest. A carry
    // from a pre-manifest version (self-contained v$cur/<table>/ dir)
    // is rewritten once instead of referenced: old version dirs are
    // deleted wholesale by GC, so a ref into one would dangle.
    val (carried, migrate) = carry.map { t =>
      require(cur > 0, s"publish: cannot carry $t — no current version")
      val rel = resolveData(f, b, t, cur).getOrElse(
        sys.error(s"publish: cannot carry $t — not in version $cur"))
      (t, rel)
    }.partition(_._2.startsWith("_data/"))
    val writes = tables ++ migrate.map { case (t, _) =>
      TableSpec(t, readAt(spark, b.toString, t, cur))
    }
    // leftover from a crashed earlier attempt at this same version —
    // uncommitted (no marker), so deleting it is invisible to readers
    f.delete(vdir, true)

    writes.foreach { t =>
      val dst = new Path(b, dataDirName(t.name, next)).toString
      if (t.partitionBy.isEmpty)
        t.df.write.mode(SaveMode.Overwrite)
          .option("compression", "zstd").parquet(dst)
      else t.df // one writer set per partition dir (no small files)
        .repartition(t.partitionBy.map(org.apache.spark.sql.functions.col): _*)
        .write.mode(SaveMode.Overwrite).option("compression", "zstd")
        .partitionBy(t.partitionBy: _*).parquet(dst)
    }
    writes.foreach { t =>
      val dd = new Path(b, dataDirName(t.name, next))
      if (!f.exists(new Path(dd, "_SUCCESS")))
        sys.error(s"publish: ${t.name} has no _SUCCESS under $dd — aborting uncommitted")
    }
    // zone-map sidecars: written into the (still-uncommitted) data
    // dirs after the parquet _SUCCESS check and before the manifest,
    // so stats and data commit together or not at all
    writes.foreach { t =>
      if (t.statsCols.nonEmpty)
        ZoneMaps.writeSidecar(spark,
          new Path(b, dataDirName(t.name, next)).toString, t.statsCols)
    }
    // MANIFEST: refs for fresh writes point at this version's data
    // dirs; refs for carried tables repeat the current version's. All
    // written before the marker — a crash mid-manifest leaves an
    // uncommitted (invisible) version dir.
    f.mkdirs(vdir)
    writes.foreach(t => writeRef(f, b, next, t.name, dataDirName(t.name, next)))
    carried.foreach { case (t, rel) => writeRef(f, b, next, t, rel) }

    // COMMIT: one atomic create. With the claim held this cannot lose
    // a race; a false here means external interference — fail loudly.
    if (!f.createNewFile(marker))
      sys.error(s"publish: version $next already committed by another writer")

    gc(f, b, next)
    next
  }

  /** GC after a commit of `next`: keep the current and previous
    * version MANIFESTS, and refcount data dirs — a `_data` dir
    * survives iff some surviving manifest references it, so versions
    * that share a carried table's files never invalidate each other,
    * and a crashed publisher's orphaned data dirs get collected here.
    * Marker first: once a version's marker is gone it can no longer
    * be resolved, so deleting its manifest (and any data dir ONLY it
    * referenced) is safe. Claims of GC'd versions go with them;
    * recent claims stay, so a publisher holding a stale `cur` fails
    * its claim instead of deleting committed data. Readers hold no
    * locks: one version of grace (the kept previous manifest + its
    * files) is the contract, exactly as before the manifest layer. */
  private def gc(f: FileSystem, b: Path, next: Long): Unit = {
    if (!f.exists(markerDir(b))) return
    f.listStatus(markerDir(b)).toSeq
      .flatMap(s => s.getPath.getName.toLongOption)
      .filter(_ < next - 1)
      .foreach { v =>
        f.delete(new Path(markerDir(b), fmt(v)), false)
        f.delete(new Path(markerDir(b), s"claim-${fmt(v)}"), false)
        f.delete(versionDir(b, v), true)
      }
    // refcount pass: data dirs referenced by any surviving manifest
    if (f.exists(dataRoot(b))) {
      val survivors = f.listStatus(markerDir(b)).toSeq
        .flatMap(s => s.getPath.getName.toLongOption)
      val referenced = survivors.flatMap { v =>
        val vdir = versionDir(b, v)
        if (!f.exists(vdir)) Seq.empty
        else f.listStatus(vdir).toSeq.filter(_.isFile)
          .map(_.getPath.getName).filter(_.endsWith(".ref"))
          .flatMap(r => readRef(f, b, v, r.stripSuffix(".ref")))
      }.toSet
      f.listStatus(dataRoot(b)).toSeq.foreach { s =>
        if (!referenced.contains(s"_data/${s.getPath.getName}"))
          f.delete(s.getPath, true)
      }
    }
  }
}
