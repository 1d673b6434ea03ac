package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Crash-safe multi-partition commits without a table-format jar — the
  * transactional twin of the reference's Postgres MERGE atomicity
  * (stg_readings.sql:15-17), which plain dir-swap merges
  * ([[graft.streaming.PathIO.replace]], dynamic partition overwrite)
  * cannot give across MULTIPLE partitions: a crash mid-swap leaves half
  * the days new and half old.
  *
  * Design (a miniature of the Delta/Iceberg log):
  *   - data files are IMMUTABLE, written once under `root/v<N>/<col>=<val>/`;
  *   - visibility is a manifest `root/_txlog/<N>.manifest` mapping every
  *     partition value to the version dir holding its current data;
  *   - a commit stages its partitions in a fresh version dir (invisible),
  *     then publishes ONE manifest via write-temp + rename-to-new-name —
  *     a single-file atomic rename on HDFS/local — flipping all touched
  *     partitions at once;
  *   - readers list `_txlog`, take the highest `.manifest` (ignoring
  *     `.tmp` debris), and read exactly the dirs it names. Any crash
  *     before the rename leaves the previous manifest latest: the table
  *     never shows a torn commit.
  *
  * Single-writer by design (the reference's hourly DAG is too).
  * Concurrent committers stage into UNIQUE nonce-named dirs (never
  * touching each other's files) and race only on the manifest
  * create-if-absent CAS — the loser FAILS LOUDLY (never a silent
  * clobber of a committed manifest); a reader can never observe a torn
  * mix. [[publishOptimistic]]/[[appendPublish]] retry that race,
  * [[publish]] treats it as a single-writer-contract violation.
  */
object TxTable {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Staged partition dirs as manifest entries: partition VALUE (in the
    * writer's escaped directory form) -> dir relative to root. The one
    * place dir names become manifest keys — [[publishImpl]],
    * [[publishOptimistic]] and [[deleteWhere]] all go through it.
    */
  private def listStaged(f: org.apache.hadoop.fs.FileSystem, root: String,
      stagedDir: String, partitionCol: String): Map[String, String] =
    f.listStatus(new Path(s"$root/$stagedDir"))
      .map(_.getPath.getName)
      .filter(_.startsWith(partitionCol + "="))
      .map(p => p.stripPrefix(partitionCol + "=") -> s"$stagedDir/$p")
      .toMap

  private def logDir(root: String) = root + "/_txlog"
  private def manifestName(v: Long) = f"$v%08d.manifest"

  /** Manifest entry values are TAB-joined lists of dirs relative to root:
    * a partition written once maps to one dir; every [[appendCommit]]
    * adds another dir to its list instead of rewriting. Tab is safe as
    * the separator because the writer percent-escapes control characters
    * in partition directory names (a literal tab can never appear).
    */
  private def dirsOf(entry: String): Seq[String] = {
    val ds = entry.split("\t").toSeq
    require(ds.forall(_.nonEmpty), s"malformed manifest entry '$entry'")
    ds
  }

  /** Latest committed state: (version, partitionValue -> dir relative to
    * root). (0, empty) when the table has no committed version.
    */
  def latest(spark: SparkSession, root: String): (Long, Map[String, String]) = {
    val f = fs(spark, root)
    val ld = new Path(logDir(root))
    if (!f.exists(ld)) return (0L, Map.empty)
    val versions = f.listStatus(ld).map(_.getPath.getName)
      .filter(_.endsWith(".manifest")) // .tmp debris from a crashed publish is invisible
      .map(_.stripSuffix(".manifest").toLong)
    if (versions.isEmpty) (0L, Map.empty)
    else {
      val v = versions.max
      (v, parseManifest(f, new Path(ld, manifestName(v))))
    }
  }

  private def parseManifest(f: org.apache.hadoop.fs.FileSystem, p: Path): Map[String, String] = {
    val in = f.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val entries = txt.split("\n").iterator.filter(_.nonEmpty).map { line =>
      line.split("\t", 2) match {
        case Array(k, dir) => k -> dir
        case _ => throw new java.io.IOException(s"malformed manifest line in $p: '$line'")
      }
    }.toMap
    if (entries.isEmpty)
      throw new java.io.IOException(s"manifest $p is empty or truncated")
    entries
  }

  /** Read the table at its latest committed version. Partitions may live
    * in different version dirs (each commit rewrites only the partitions
    * it touched); one pruned scan per referenced version, unioned.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    readManifest(spark, root, latest(spark, root) match {
      case (v, e) => require(v > 0 && e.nonEmpty, s"no committed version at $root"); e
    })

  /** Time travel: read the table AS OF a past committed version — free,
    * because manifests are immutable and version dirs are append-only
    * until [[vacuum]] (which therefore bounds the travel horizon; run it
    * only past your audit window).
    */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val f = fs(spark, root)
    val m = new Path(logDir(root), manifestName(version))
    require(f.exists(m),
      s"version $version does not exist at $root (committed or already vacuumed)")
    readManifest(spark, root, parseManifest(f, m))
  }

  private def readManifest(
      spark: SparkSession, root: String, entries: Map[String, String]): DataFrame = {
    val byVersion = entries.values.toSeq.flatMap(dirsOf).groupBy(_.takeWhile(_ != '/'))
    // allowMissingColumns = schema evolution: a commit may ADD columns;
    // partitions still living in older version dirs read as null for
    // them (and a column dropped by a new commit survives as null on the
    // new partitions until every partition is rewritten). Version dirs
    // are iterated in sorted order so the NEWEST schema wins the union's
    // column order deterministically.
    val dfs = byVersion.toSeq.sortBy { case (vdir, _) =>
      -vdir.drop(1).takeWhile(_.isDigit).toLong // numeric: v10 > v2
    }.map { case (vdir, dirs) =>
      spark.read
        .option("basePath", s"$root/$vdir")
        .parquet(dirs.map(d => s"$root/$d").toSeq: _*)
    }
    widenAll(dfs).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Numeric type widening across version schemas: a commit that turns
    * an int column into long (or a float into double) must not break
    * reads of partitions still stored with the old type, and must not
    * lose precision. Conflicting NUMERIC columns are cast up to the
    * common widened type — integer families widen to the larger
    * integer; any int×float mix widens to DOUBLE, because Spark's own
    * set-operation coercion picks float for long∪float, which silently
    * corrupts longs above 2^24. Every other type pair passes through
    * unchanged to `unionByName`'s standard coercion (decimal precision,
    * date→timestamp, nullability, …) so no previously-readable table
    * becomes unreadable.
    */
  private def widenAll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val intRank = Map[DataType, Int](ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)
    val fltRank = Map[DataType, Int](FloatType -> 0, DoubleType -> 1)
    def widen(a: DataType, b: DataType): Option[DataType] =
      if (a == b) Some(a)
      else if (intRank.contains(a) && intRank.contains(b))
        Some(if (intRank(a) >= intRank(b)) a else b)
      else if (fltRank.contains(a) && fltRank.contains(b))
        Some(if (fltRank(a) >= fltRank(b)) a else b)
      else if ((intRank.contains(a) && fltRank.contains(b)) ||
          (fltRank.contains(a) && intRank.contains(b))) Some(DoubleType)
      else None // not ours: defer to unionByName's own coercion
    // per column: Some(widened) while every observed pair is ours to
    // widen; None once any pair falls outside the numeric families
    val target = scala.collection.mutable.LinkedHashMap.empty[String, Option[DataType]]
    for (df <- dfs; f <- df.schema.fields) {
      target(f.name) = target.get(f.name) match {
        case None => Some(f.dataType)
        case Some(Some(t)) => widen(t, f.dataType)
        case Some(None) => None
      }
    }
    dfs.map { df =>
      val needsCast = df.schema.fields.exists(f =>
        target(f.name).exists(_ != f.dataType))
      if (!needsCast) df
      else df.select(df.schema.fields.map { f =>
        target(f.name) match {
          case Some(t) if t != f.dataType => col(f.name).cast(t).as(f.name)
          case _ => col(f.name)
        }
      }.toSeq: _*)
    }
  }

  /** Stage a new version: write `data` — the FULL new content of every
    * partition it touches — under a UNIQUE version dir
    * (`v<latest+1>-<nonce>`), partitioned by `partitionCol`. Not visible
    * until [[publish]]. Returns the staged dir name.
    *
    * The nonce means stagers can NEVER touch each other's files: crash
    * debris from an earlier attempt sits in its own dir (invisible —
    * no manifest names it — and collected by [[vacuum]]), and a
    * concurrent stager writes elsewhere, so there is no exists-check/
    * delete race on a shared path.
    */
  def stage(spark: SparkSession, root: String, data: DataFrame, partitionCol: String): String = {
    val next = latest(spark, root)._1 + 1
    val dir = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}"
    data.write
      .mode(SaveMode.ErrorIfExists)
      .partitionBy(partitionCol)
      .parquet(s"$root/$dir")
    dir
  }

  /** Publish a staged dir: build the new manifest (previous entries
    * overridden by the staged partitions), write it to a temp name, and
    * atomically rename it into place. All staged partitions become
    * visible in the same instant; a crash anywhere before the rename
    * leaves the table at the previous version.
    *
    * Concurrency: the table is single-writer by contract. If two
    * publishers race anyway, each writes a complete self-consistent
    * manifest and the version-number CAS picks exactly one winner — the
    * loser throws (on the local FS too: hard-link create-if-absent, not
    * an overwriting rename, so a committed manifest — e.g. a concurrent
    * [[appendPublish]] — can never be silently clobbered). A reader can
    * never observe a torn mix, because manifests are only ever created
    * whole.
    */
  def publish(spark: SparkSession, root: String, stagedDir: String, partitionCol: String): Unit =
    publishImpl(spark, root, stagedDir, partitionCol, replaceAll = false)

  private def publishImpl(spark: SparkSession, root: String, stagedDir: String,
      partitionCol: String, replaceAll: Boolean): Unit = {
    val f = fs(spark, root)
    val (v, old) = latest(spark, root)
    val changed = listStaged(f, root, stagedDir, partitionCol)
    require(changed.nonEmpty, s"staged dir $stagedDir has no $partitionCol= partitions")
    val next = v + 1
    // replaceAll (compaction): the staged dir IS the whole table — a
    // merge would keep an old entry alive whenever a partition VALUE
    // round-trips to a different directory string (e.g. day=00123
    // re-inferred as int and rewritten day=123), duplicating its rows
    val entries = if (replaceAll) changed else old ++ changed
    writeManifest(f, root, next, entries,
      s"staged data remains at $root/$stagedDir")
  }

  /** Single-writer publish tail shared by [[publishImpl]] and
    * [[deleteWhere]]: one create-if-absent CAS attempt at version
    * `next`. Routed through [[casManifest]] rather than a plain rename
    * because POSIX rename OVERWRITES — a concurrent [[appendPublish]]
    * that just CAS-committed the same version number would be silently
    * clobbered (a lost committed append). Losing the CAS here means
    * another writer took the version: the single-writer contract was
    * violated, so fail LOUDLY with the recovery hint instead.
    */
  private def writeManifest(f: org.apache.hadoop.fs.FileSystem, root: String,
      next: Long, entries: Map[String, String], onFailure: String): Unit =
    if (!casManifest(f, root, next, entries))
      throw new java.io.IOException(
        s"manifest publish failed for version $next (a concurrent writer " +
          s"committed it first — this path is single-writer by contract); $onFailure")

  /** Stage + publish in one call: the crash-safe replacement for a
    * multi-partition dir-swap merge.
    */
  def commit(spark: SparkSession, root: String, data: DataFrame, partitionCol: String): Unit =
    publish(spark, root, stage(spark, root, data, partitionCol), partitionCol)

  /** Row-level delete — the takedown/right-to-erasure path: remove every
    * row where `predicate` is TRUE (NULL = keep, standard SQL DELETE
    * three-valued semantics) by rewriting ONLY the partitions that
    * contain matches, published atomically as one new version. Untouched
    * partitions keep their existing files (their manifest entries carry
    * over byte-identically — at 100 TB a takedown of one user's rows
    * rewrites a handful of partitions, not the table). A partition whose
    * every row matches is dropped from the manifest entirely. Returns
    * the number of rows deleted (0 = no-op, no version published).
    *
    * Time travel ([[readAt]]) still reaches the pre-delete versions
    * until [[vacuum]] — the deletion audit trail; run vacuum to make the
    * erasure physical.
    *
    * Single-writer, same as [[publish]]. `predicate` must be
    * DETERMINISTIC (checked): it is evaluated in two separate jobs —
    * the affected-partition discovery and the survivor rewrite — and a
    * nondeterministic predicate (rand(), wall-clock) would delete a
    * different row set than it counted. Manifest keys are matched via
    * the writer's own path escaping, so partition values that need
    * escaping (or alias each other's escaped form) are handled, not
    * assumed away; null partition values are rejected.
    */
  def deleteWhere(spark: SparkSession, root: String,
      partitionCol: String, predicate: Column): Long = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, not}
    val f = fs(spark, root)
    val (v, old) = latest(spark, root)
    require(v > 0 && old.nonEmpty, s"no committed version at $root")
    val cur = read(spark, root)
    // deterministic-after-analysis: expr("rand() < 0.5") only resolves to
    // a Nondeterministic node once analyzed against the actual table
    val analyzedDet = cur.filter(predicate).queryExecution.analyzed.collectFirst {
      case flt: org.apache.spark.sql.catalyst.plans.logical.Filter => flt.condition.deterministic
    }.getOrElse(true)
    require(analyzedDet,
      "deleteWhere predicate must be deterministic — it is evaluated once to find " +
        "affected partitions and again to rewrite survivors; rand()/shuffle-order-" +
        "dependent predicates would delete a different set than they report")
    val hit = coalesce(predicate, lit(false)) // NULL predicate = keep the row
    // ONE action finds the affected partitions AND the per-partition
    // delete counts (driver-side result is bounded by |partitions|)
    val perPart = cur.filter(hit)
      .groupBy(col(partitionCol).cast("string").as("p"))
      .agg(count(lit(1)).as("n"))
      .collect()
    if (perPart.isEmpty) return 0L
    require(!perPart.exists(_.isNullAt(0)),
      s"deleteWhere matched rows with a NULL $partitionCol — null partition values " +
        "are not supported by the manifest log")
    // raw values filter ROWS; writer-escaped values address MANIFEST
    // KEYS (a raw value may alias a DIFFERENT value's escaped dir name —
    // comparing raw strings to keys would drop the wrong partition)
    val affectedRaw = perPart.map(_.getString(0)).toSet
    val affectedKeys = affectedRaw.map(escapePathName)
    val deleted = perPart.map(_.getLong(1)).sum
    val unknown = (affectedKeys -- old.keySet).toSeq.sorted
    require(unknown.isEmpty,
      s"escaped partition values [${unknown.mkString(", ")}] are not manifest keys — " +
        s"the table was not written through TxTable.stage, or $partitionCol does not " +
        "round-trip CAST AS STRING")
    val survivors = cur
      .filter(col(partitionCol).cast("string").isin(affectedRaw.toSeq: _*))
      .filter(not(hit))
    // fully-deleted partitions simply never appear in the staged dir
    val stagedDir = stage(spark, root, survivors, partitionCol)
    val entries = (old -- affectedKeys) ++ listStaged(f, root, stagedDir, partitionCol)
    require(entries.nonEmpty,
      s"deleteWhere would remove every row of $root — refusing (an empty table has no " +
        s"manifest representation); drop the table root explicitly instead")
    writeManifest(f, root, v + 1, entries,
      s"staged survivors remain at $root/$stagedDir")
    deleted
  }

  /** Thrown by [[publishOptimistic]] when another committer changed one
    * of THIS commit's partitions after `baseVersion` — a write-write
    * conflict the caller must resolve by re-deriving its data from the
    * new table state.
    */
  final class WriteConflictException(msg: String) extends java.io.IOException(msg)

  /** Optimistic multi-writer publish (snapshot OCC, the Delta/Iceberg
    * commit protocol in miniature): the caller read the table at
    * `baseVersion`, derived `stagedDir` from it, and now attempts to
    * commit. If other writers committed in between, their manifests are
    * REBASED under ours — unless one of them touched a partition we
    * are changing, which is a [[WriteConflictException]] (partition-
    * level write-write conflict; blind last-wins would silently drop
    * their rows). The manifest create is the CAS: write-tmp then
    * rename to the next version's name, which fails when that version
    * was taken (HDFS rename-to-existing is atomic-no; the local-FS
    * exists-check narrows the same race for tests) — the loser
    * re-reads, re-checks conflicts, and retries at the next number.
    * Disjoint-partition writers therefore ALL succeed, serialized by
    * version number; same-partition writers fail loudly.
    *
    * Returns the committed version.
    */
  def publishOptimistic(
      spark: SparkSession, root: String, stagedDir: String, partitionCol: String,
      baseVersion: Long, maxRetries: Int = 10): Long = {
    val f = fs(spark, root)
    val changed = listStaged(f, root, stagedDir, partitionCol)
    require(changed.nonEmpty, s"staged dir $stagedDir has no $partitionCol= partitions")
    val baseState: Map[String, String] =
      if (baseVersion == 0L) Map.empty
      else parseManifest(f, new Path(logDir(root), manifestName(baseVersion)))
    val ld = new Path(logDir(root))
    if (!f.exists(ld) && !f.mkdirs(ld))
      throw new java.io.IOException(s"cannot create $ld")

    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val (v, cur) = latest(spark, root)
      require(v >= baseVersion, s"base version $baseVersion is ahead of the log ($v)")
      // write-write check against every intervening commit
      val conflicts = changed.keys.filter(k => cur.get(k) != baseState.get(k)).toSeq.sorted
      if (conflicts.nonEmpty)
        throw new WriteConflictException(
          s"partitions [${conflicts.mkString(", ")}] changed since version $baseVersion — rebase required")
      val next = v + 1
      if (casManifest(f, root, next, cur ++ changed)) return next
    }
    throw new java.io.IOException(
      s"could not commit after $maxRetries attempts — log is too contended")
  }

  /** Atomic create-if-absent of manifest `next`. POSIX rename(2)
    * OVERWRITES an existing destination, so a check-then-rename on the
    * local FS would let two racers both pass the check and the second
    * silently clobber the first's manifest — the exact lost commit the
    * OCC protocol forbids. Hard LINK creation is the atomic
    * create-if-absent POSIX does offer (link(2) fails EEXIST); HDFS
    * rename already refuses an existing destination atomically in the
    * namenode. Returns whether THIS writer won version `next`.
    */
  private def casManifest(f: org.apache.hadoop.fs.FileSystem, root: String,
      next: Long, entries: Map[String, String]): Boolean = {
    val ld = new Path(logDir(root))
    if (!f.exists(ld) && !f.mkdirs(ld))
      throw new java.io.IOException(s"cannot create $ld")
    val dest = new Path(ld, manifestName(next))
    // A concurrent [[vacuum]] may sweep our tmp between create and link
    // (its mtime grace makes that vanishingly rare but not impossible on
    // a clock-skewed FS) — that is NOT a lost CAS, just a lost tmp, so
    // recreate and re-attempt; only dest-exists decides who won.
    var attempt = 0
    while (true) {
      attempt += 1
      val tmp = new Path(ld,
        manifestName(next) + s".${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val out = f.create(tmp, true)
      try out.write(
        entries.toSeq.sorted.map { case (k, dir) => s"$k\t$dir" }.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      try {
        val won =
          if (f.getUri.getScheme == "file") {
            try {
              java.nio.file.Files.createLink(
                java.nio.file.Paths.get(dest.toUri.getPath),
                java.nio.file.Paths.get(tmp.toUri.getPath))
              true
            } catch { case _: java.nio.file.FileAlreadyExistsException => false }
          } else {
            val renamed = f.rename(tmp, dest)
            // Hadoop rename() reports BOTH "dest already exists" (a
            // genuinely lost CAS) and "tmp vanished" (a vacuum-swept
            // tmp) as plain `false`. Only dest-exists decides who won:
            // if dest is absent the CAS is still open — surface it as
            // the same lost-tmp retry the hardlink path takes, instead
            // of a spurious concurrent-writer verdict.
            if (!renamed && !f.exists(dest))
              throw new java.nio.file.NoSuchFileException(tmp.toString)
            renamed
          }
        f.delete(tmp, false) // committed via link, or lost the CAS — either way drop tmp
        return won
      } catch {
        case e: java.nio.file.NoSuchFileException =>
          if (attempt >= 3) throw new java.io.IOException(
            s"manifest tmp vanished $attempt times publishing version $next " +
              "(is a vacuum running in a tight loop?)", e)
      }
    }
    false // unreachable
  }

  /** BLIND APPEND: add `stagedDir`'s partitions to the table WITHOUT
    * rewriting anything — each touched partition's manifest entry grows
    * by one dir; its existing dirs (and every untouched partition) carry
    * over verbatim. Appends COMMUTE, so unlike [[publishOptimistic]]
    * there is no write-write conflict under any concurrency: concurrent
    * appenders race only on the manifest CAS and the loser simply
    * remerges on top of the winner (the Delta "blind appends never
    * conflict" rule). The scale rationale: an incremental ingest at
    * 100 TB must cost O(increment), never O(partition) — rewrite-commit
    * ([[commit]]) rewrites every touched partition, append-commit writes
    * only the new rows.
    *
    * Tradeoff: each append adds one dir (and its files) to the
    * partition's scan list — run [[compactAll]] when accumulated appends
    * fragment reads, exactly like Delta OPTIMIZE.
    *
    * Returns the committed version.
    */
  def appendPublish(spark: SparkSession, root: String, stagedDir: String,
      partitionCol: String, maxRetries: Int = 10): Long = {
    val f = fs(spark, root)
    val changed = listStaged(f, root, stagedDir, partitionCol)
    require(changed.nonEmpty, s"staged dir $stagedDir has no $partitionCol= partitions")
    val ld = new Path(logDir(root))
    if (!f.exists(ld) && !f.mkdirs(ld))
      throw new java.io.IOException(s"cannot create $ld")
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val (v, cur) = latest(spark, root)
      val entries = cur ++ changed.map { case (k, dir) =>
        k -> cur.get(k).map(_ + "\t" + dir).getOrElse(dir)
      }
      if (casManifest(f, root, v + 1, entries)) return v + 1
    }
    throw new java.io.IOException(
      s"could not append after $maxRetries attempts — log is too contended")
  }

  /** Stage + blind-append in one call: the O(increment) ingest commit. */
  def appendCommit(spark: SparkSession, root: String, data: DataFrame,
      partitionCol: String): Long =
    appendPublish(spark, root, stage(spark, root, data, partitionCol), partitionCol)

  /** [[appendCommit]] tolerating a POSSIBLY-EMPTY increment: stage
    * first, publish only when at least one partition actually landed —
    * ONE write job instead of the count-then-write pair an emptiness
    * pre-check costs (the count re-evaluates the whole increment; at
    * increment sizes the fixed per-job driver latency is the dominant
    * term, r13 verdict item 1). An empty staging (a bare dir with
    * write metadata, no partition subdirs) is deleted immediately as
    * debris and the table version is unchanged. Returns the committed
    * version (or the unchanged latest). */
  def appendCommitNonEmpty(spark: SparkSession, root: String, data: DataFrame,
      partitionCol: String): Long = {
    val stagedDir = stage(spark, root, data, partitionCol)
    val f = fs(spark, root)
    if (listStaged(f, root, stagedDir, partitionCol).nonEmpty)
      appendPublish(spark, root, stagedDir, partitionCol)
    else {
      f.delete(new Path(s"$root/$stagedDir"), true)
      latest(spark, root)._1
    }
  }

  /** Read-stage-publish with OCC: returns the committed version. */
  def commitOptimistic(
      spark: SparkSession, root: String, data: DataFrame, partitionCol: String): Long = {
    val base = latest(spark, root)._1
    publishOptimistic(spark, root, stage(spark, root, data, partitionCol), partitionCol, base)
  }

  /** Incremental read: the rows ADDED between `sinceVersion` (exclusive)
    * and `toVersion` (inclusive) — the cheap "new data since version V"
    * poll an incremental consumer (a training job tailing a shard
    * table) runs instead of re-scanning the table. Cost is O(increment):
    * only the data dirs that appeared in the manifest AFTER
    * `sinceVersion` are scanned; the manifests themselves are two small
    * log files.
    *
    * Valid ONLY across blind-append commits ([[appendCommit]] /
    * [[appendPublish]]), whose manifest entries GROW — every old
    * partition keeps its dirs and new dirs join the tail. A rewriting
    * commit in the window ([[commit]], [[deleteWhere]], [[compactAll]],
    * [[compactZOrder]]) re-homes EXISTING rows into fresh dirs, where a
    * dir-level diff would double-count them as new — detected (an old
    * entry whose dir list is not a prefix of the new one, or a dropped
    * partition) and REFUSED loudly: the consumer must re-baseline from a
    * full snapshot at `toVersion` rather than receive silently duplicated
    * or phantom rows. `sinceVersion = 0` returns the full snapshot (every
    * dir is new to a consumer that has seen nothing).
    *
    * Both manifests must still exist ([[vacuum]] bounds the horizon —
    * same contract as [[readAt]]). Returns None when the window adds no
    * dirs (toVersion may still be > sinceVersion: a manifest can be
    * published with no new data dirs, e.g. a lost-CAS retry artifact).
    */
  def readSince(spark: SparkSession, root: String,
      sinceVersion: Long, toVersion: Long): Option[DataFrame] = {
    require(sinceVersion <= toVersion,
      s"readSince window is inverted: since=$sinceVersion > to=$toVersion")
    if (sinceVersion == toVersion) return None
    val f = fs(spark, root)
    val newEntries = parseManifest(f, {
      val m = new Path(logDir(root), manifestName(toVersion))
      require(f.exists(m), s"version $toVersion does not exist at $root " +
        "(committed or already vacuumed)")
      m
    })
    val oldEntries: Map[String, String] =
      if (sinceVersion == 0L) Map.empty
      else parseManifest(f, {
        val m = new Path(logDir(root), manifestName(sinceVersion))
        require(f.exists(m), s"version $sinceVersion does not exist at $root " +
          "(committed or already vacuumed) — re-baseline from a full snapshot")
        m
      })
    val added = newEntries.toSeq.flatMap { case (k, entry) =>
      val newDirs = dirsOf(entry)
      val oldDirs = oldEntries.get(k).map(dirsOf).getOrElse(Seq.empty)
      require(newDirs.take(oldDirs.size) == oldDirs,
        s"partition '$k' was REWRITTEN between versions $sinceVersion and " +
          s"$toVersion (dirs ${oldDirs.mkString(",")} -> ${newDirs.mkString(",")}) " +
          "— a dir-level delta would double-count its rows; re-baseline from " +
          s"readAt($toVersion)")
      newDirs.drop(oldDirs.size).map(k -> _)
    }
    val dropped = (oldEntries.keySet -- newEntries.keySet).toSeq.sorted
    require(dropped.isEmpty,
      s"partitions [${dropped.mkString(", ")}] were DELETED between versions " +
        s"$sinceVersion and $toVersion — the append-only delta contract is " +
        s"broken; re-baseline from readAt($toVersion)")
    if (added.isEmpty) None
    else Some(readManifest(spark, root, added.groupBy(_._1).map {
      case (k, kvs) => k -> kvs.map(_._2).mkString("\t")
    }))
  }

  /** Migration guard: a pre-existing FLAT parquet table at `root` (the
    * pre-TxTable on-disk format) must not be silently shadowed — writing
    * a `_txlog` beside it would freeze the flat files forever while
    * legacy `spark.read.parquet(root)` readers keep consuming them.
    * Call before the FIRST commit of any path that may hold legacy data.
    */
  def requireNotFlatTable(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val rp = new Path(root)
    val hasLog = f.exists(new Path(logDir(root)))
    if (!hasLog && f.exists(rp) &&
        f.listStatus(rp).map(_.getPath.getName)
          .exists(n => n.startsWith("part-") || n == "_SUCCESS"))
      throw new IllegalStateException(
        s"$root holds a flat parquet table (pre-TxTable format); migrate it first " +
          "(e.g. TxTable.commit(spark, root+\".tx\", spark.read.parquet(root), <partitionCol>)) " +
          "or point the writer at a fresh root")
  }

  /** Compact the table: rewrite EVERY live partition into one fresh
    * version dir and publish it as the COMPLETE new manifest. Bounds the
    * version-dir sprawl an incremental writer accretes (each commit
    * leaves its partitions scattered across the version dirs that last
    * touched them — after thousands of commits a read unions thousands
    * of scans). The manifest is replaced wholesale, not merged: since
    * the staged dir holds every live row, merging could only resurrect
    * stale entries (a partition value whose directory form changes
    * across the read/write round-trip would otherwise stay live twice).
    * Run [[vacuum]] afterwards to reclaim the superseded dirs; time
    * travel before the compaction point survives until then.
    */
  def compactAll(spark: SparkSession, root: String, partitionCol: String): Unit =
    publishImpl(spark, root, stage(spark, root, read(spark, root), partitionCol),
      partitionCol, replaceAll = true)

  /** Z-order compaction (the OPTIMIZE ZORDER BY analog): [[compactAll]]
    * plus the [[TableLayout.zValue]] clustered layout — rows are
    * range-partitioned on (partitionCol, morton(zorderCols)) and sorted
    * within tasks, so after the rewrite each partition dir's files
    * cover COMPACT z-curve segments and every zorder column's parquet
    * min/max footer is tight. A later scan with a box predicate on the
    * zorder columns prunes most files by statistics alone
    * (`graft.pipeline.ZOrderSpec` has the measured bound); an
    * append-heavy table instead accretes files whose per-column ranges
    * each span the whole domain, so every box scan reads every file.
    * Same crash-safety as compactAll: the clustered rewrite stages
    * invisibly and ONE manifest CAS replaces the table wholesale; time
    * travel to pre-compaction versions survives until [[vacuum]].
    *
    * `numFiles` bounds the range exchange's partition count — size it
    * as liveBytes / targetFileBytes (e.g. 1 GiB targets) at scale; the
    * partitionBy write splits each task's rows by partition value, and
    * because tasks hold contiguous (partition, z) ranges the per-dir
    * files stay z-contiguous.
    */
  def compactZOrder(spark: SparkSession, root: String, partitionCol: String,
      zorderCols: Seq[String], bits: Int = 16, numFiles: Int = 64): Unit = {
    import org.apache.spark.sql.functions.col
    val data = read(spark, root)
    val zkey = TableLayout.zValue(
      zorderCols.map(col), TableLayout.columnBounds(data, zorderCols), bits)
    val kc = graft.ops.SkewOps.freshName(data, "_z")
    val clustered = data.withColumn(kc, zkey)
      .repartitionByRange(numFiles, col(partitionCol), col(kc))
      .sortWithinPartitions(partitionCol, kc)
      .drop(kc)
    publishImpl(spark, root, stage(spark, root, clustered, partitionCol),
      partitionCol, replaceAll = true)
  }

  /** Run level of a version dir: append-staged dirs (`v<N>-<nonce>`)
    * are level-0 runs; [[compactLeveled]] merges write `-l<k>`-suffixed
    * dirs, so the leveling policy is derivable from the manifest alone
    * (no sidecar state to desync). */
  private def runLevel(vdir: String): Int =
    "-l(\\d+)$".r.findFirstMatchIn(vdir).map(_.group(1).toInt).getOrElse(0)

  /** LEVELED (size-tiered) compaction — O(period) routine maintenance
    * for an append-only table, replacing [[compactAll]]/[[compactZOrder]]'s
    * O(corpus) full rewrite in the maintenance cadence (the r13
    * verdict's one named scale-killer: at 100 TB a maintenance pass
    * that re-reads and re-writes the whole corpus is not runnable).
    *
    * Model: every dir in a manifest entry is a RUN; append dirs are
    * level-0 runs. One call merges ALL current level-0 runs into ONE
    * level-1 run — clustered like [[compactZOrder]] (range-partitioned
    * on (partitionCol, z(zorderCols)), sorted within tasks, so each
    * run's parquet min/max footers stay tight and the id-range probes
    * an incremental writer runs keep pruning by statistics) — then,
    * while any level holds >= `fanout` runs, promotes that level into
    * one run of the next. Cost per call is O(bytes merged): routine
    * firings touch only the appends landed since the last call; a
    * level-k promotion touches ~fanout^k periods but fires fanout^k×
    * more rarely — amortized O(N·log N) lifetime I/O, with the
    * full-corpus rewrite surviving only as the RARE top-level merge
    * (for id-ordered ingest the runs are id-disjoint, so even that
    * merge is optional: reads stay pruned without it).
    *
    * Crash-safety per merge step is every commit's: stage invisibly,
    * publish ONE manifest CAS; a crash leaves the previous version
    * live. Content is bit-identical (pure layout); [[readSince]]
    * across a firing REFUSES like any rewrite — pollers re-baseline.
    * Untouched runs keep their manifest entries verbatim, in order
    * (higher-level runs are strictly older than lower, so entries stay
    * chronological). Run [[vacuum]] afterwards to reclaim merged dirs.
    *
    * Returns the number of merge steps performed (0 = fewer than
    * `minLevel0` level-0 runs and nothing promotable — call again
    * after more appends).
    *
    * `minMergeLevel`/`maxMergeLevel` bound WHICH levels may merge —
    * the split a bounded-latency maintenance cadence needs (r15):
    * a stream's trigger path runs `maxMergeLevel = 0` (only the
    * routine level-0 merge, cost O(appends since the last firing) by
    * construction), while the level promotions — whose cost is
    * ~fanout^k periods and whose measured wall blocked triggers for
    * 40–58 s when run inline — move to an out-of-band owner running
    * `minMergeLevel = 1`.
    *
    * CONCURRENCY (r15): the merge publish REBASES over concurrent
    * blind appends instead of failing — leveled maintenance is pure
    * layout, so it composes with appenders the way appends compose
    * with each other. On a lost manifest CAS the publisher re-reads
    * the log; appends only ADD dirs, so as long as every merged run
    * is still live verbatim, the fresh entries are recomputed around
    * the staged run and the CAS retried at the next version. A merged
    * run that VANISHED means a concurrent rewrite (another compactor,
    * a deleteWhere, a vacuum sweep) owned it — that is a real
    * single-owner violation and still fails loudly. Do not run TWO
    * compactors over the same LEVELS; appenders are free.
    */
  /** Test-only injection points for [[compactLeveled]]'s rebase publish:
    * deterministic lost-CAS coverage without a real thread race.
    * `Publish` fires immediately before every CAS attempt (a spec makes
    * it append once to steal the version); `Rebase` fires at the start
    * of every retry. Production never sets these. */
  private[pipeline] var testHookCompactPublish: () => Unit = () => ()
  private[pipeline] var testHookCompactRebase: () => Unit = () => ()

  def compactLeveled(spark: SparkSession, root: String, partitionCol: String,
      zorderCols: Seq[String], fanout: Int = 8, bits: Int = 16,
      numFiles: Int = 16, minLevel0: Int = 2,
      minMergeLevel: Int = 0, maxMergeLevel: Int = Int.MaxValue): Int = {
    import org.apache.spark.sql.functions.col
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    require(minMergeLevel <= maxMergeLevel,
      s"minMergeLevel=$minMergeLevel > maxMergeLevel=$maxMergeLevel")
    val f = fs(spark, root)
    var steps = 0
    var continue = true
    while (continue) {
      val (v, entries) = latest(spark, root)
      if (v == 0) return steps
      val byLevel = entries.values.flatMap(dirsOf).map(_.takeWhile(_ != '/'))
        .toSet.groupBy(runLevel)
      // lowest level first: merge l0 whenever >= minLevel0 runs (the
      // routine firing), promote level k>=1 only at fanout — within
      // the caller's [minMergeLevel, maxMergeLevel] window
      val mergeable = byLevel.collect {
        case (0, ds) if minMergeLevel <= 0 && 0 <= maxMergeLevel &&
          ds.size >= minLevel0 => (0, ds)
        case (k, ds) if k >= 1 && k >= minMergeLevel && k <= maxMergeLevel &&
          ds.size >= fanout => (k, ds)
      }.toSeq.sortBy(_._1)
      mergeable.headOption match {
        case None => continue = false
        case Some((lv, toMerge)) =>
          // read ONLY the merged runs' dirs (the O(period) claim)
          val sub = entries.flatMap { case (k, e) =>
            val ds = dirsOf(e).filter(d => toMerge(d.takeWhile(_ != '/')))
            if (ds.isEmpty) None else Some(k -> ds.mkString("\t"))
          }
          val data = readManifest(spark, root, sub)
          // file count scales with the MERGED bytes (driver-side fs
          // sizing, no job): a routine level-0 firing keeps the small
          // default, while a top-level promotion that merges most of
          // the corpus fans out to ~512 MiB output files instead of
          // serializing the whole merge through `numFiles` range
          // partitions (unbounded file sizes + a 16-way sort of the
          // corpus at the 100 TB framing)
          val mergedBytes = toMerge.toSeq.map { d =>
            try f.getContentSummary(new Path(s"$root/$d")).getLength
            catch { case _: java.io.FileNotFoundException => 0L }
          }.sum
          val targetFileBytes = 512L * 1024 * 1024
          val nf = math.min(4096L,
            math.max(numFiles.toLong, mergedBytes / targetFileBytes + 1)).toInt
          val zkey = TableLayout.zValue(
            zorderCols.map(col), TableLayout.columnBounds(data, zorderCols), bits)
          val kc = graft.ops.SkewOps.freshName(data, "_z")
          val clustered = data.withColumn(kc, zkey)
            .repartitionByRange(nf, col(partitionCol), col(kc))
            .sortWithinPartitions(partitionCol, kc)
            .drop(kc)
          val next = v + 1
          val dir = s"v$next-${java.util.UUID.randomUUID().toString.take(8)}-l${lv + 1}"
          clustered.write
            .mode(SaveMode.ErrorIfExists)
            .partitionBy(partitionCol)
            .parquet(s"$root/$dir")
          val staged = listStaged(f, root, dir, partitionCol)
          require(staged.nonEmpty,
            s"leveled merge of ${toMerge.size} level-$lv runs staged no partitions " +
              s"at $root/$dir — merged runs cannot be empty")
          // rebase-over-appends publish (see Scaladoc): recompute the
          // entries around the ALREADY-STAGED run on each lost CAS —
          // the expensive merge is never re-done, only the cheap
          // manifest math. The `vN` prefix in the staged dir's name can
          // go stale across a rebase; it is forensic, never parsed.
          var curV = v
          var curEntries = entries
          var published = false
          var attempt = 0
          while (!published) {
            attempt += 1
            if (attempt > 1) {
              testHookCompactRebase()
              val (v2, e2) = latest(spark, root)
              val live = e2.values.flatMap(dirsOf)
                .map(_.takeWhile(_ != '/')).toSet
              val missing = toMerge.filterNot(live)
              if (missing.nonEmpty) throw new java.io.IOException(
                s"leveled merge lost its source runs [${missing.mkString(", ")}] to a " +
                  s"concurrent rewrite at $root — two compactors (or a compactor and a " +
                  s"deleteWhere/vacuum) ran over the same runs; staged run remains at $root/$dir")
              curV = v2; curEntries = e2
            }
            if (attempt > 20) throw new java.io.IOException(
              s"leveled merge could not publish after 20 attempts at $root — " +
                s"log too contended; staged run remains at $root/$dir")
            val newEntries = (curEntries.keySet ++ staged.keySet).flatMap { k =>
              val keep = curEntries.get(k)
                .map(dirsOf(_).filterNot(d => toMerge(d.takeWhile(_ != '/'))))
                .getOrElse(Seq.empty)
              val ds = keep ++ staged.get(k)
              if (ds.isEmpty) None else Some(k -> ds.mkString("\t"))
            }.toMap
            testHookCompactPublish()
            published = casManifest(f, root, curV + 1, newEntries)
          }
          steps += 1
      }
    }
    steps
  }

  /** Table history (the DESCRIBE HISTORY analog): one row per
    * still-travelable version — (version, committedAt millis, partition
    * count, dir count). Dir count > partition count measures append
    * fragmentation (when the gap grows, run [[compactAll]]). Reads only
    * the manifest log; never touches data files.
    */
  def history(spark: SparkSession, root: String): Seq[(Long, Long, Int, Int)] = {
    val f = fs(spark, root)
    val ld = new Path(logDir(root))
    if (!f.exists(ld)) return Seq.empty
    f.listStatus(ld)
      .filter(_.getPath.getName.endsWith(".manifest"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        // a concurrent vacuum may delete a superseded manifest between
        // the listing and this read — skip it, like latest() effectively
        // does (vacuum never deletes the max manifest)
        try {
          val entries = parseManifest(f, st.getPath)
          Some((st.getPath.getName.stripSuffix(".manifest").toLong,
            st.getModificationTime,
            entries.size,
            entries.values.map(dirsOf(_).size).sum))
        } catch { case _: java.io.FileNotFoundException => None }
      }.toSeq
  }

  /** Total bytes of the live version dirs at the latest committed
    * version — a driver-side fs walk (no Spark job), the cheap size
    * signal a probe-regime gate reads ([[DedupIndex]]'s scan-vs-prune
    * decision). Dir-granular: a version dir that is only PARTIALLY
    * live (some partitions superseded by a later rewrite) counts in
    * full, so this is an upper bound — exactly the safe direction for
    * a "is the table big enough to bother pruning" gate. 0 when
    * nothing is committed. */
  def liveBytes(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val (v, entries) = latest(spark, root)
    if (v == 0) return 0L
    val dirs: Seq[String] =
      entries.values.flatMap(dirsOf).map(_.takeWhile(_ != '/')).toSet.toSeq
    dirs.map { d =>
      try f.getContentSummary(new Path(s"$root/$d")).getLength
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
  }

  /** Append-fragmentation signal: data dirs per live partition at the
    * latest version (1.0 = perfectly compacted; each blind append adds
    * one dir to every partition it touches, so a pure appender's value
    * grows by ~1 per commit). 0 when the table has no committed
    * version. The cheap poll a maintenance cadence reads —
    * [[history]] gives the same number per version but parses every
    * manifest. */
  def fragmentation(spark: SparkSession, root: String): Double = {
    val (v, entries) = latest(spark, root)
    if (v == 0 || entries.isEmpty) 0.0
    else entries.values.map(dirsOf(_).size).sum.toDouble / entries.size
  }

  /** UNCOMPACTED (level-0) append runs per live partition — the
    * trigger a LEVELED maintenance cadence compares its threshold
    * against. [[fragmentation]] counts ALL runs, which under leveling
    * has a structural floor of roughly one run per accumulated level
    * (up to fanout−1 per level), so a threshold compared against the
    * total degenerates into firing on every commit once two levels
    * exist — while this metric returns to ZERO after each firing and
    * the threshold keeps meaning "this many appends since the last
    * compaction". */
  def level0Fragmentation(spark: SparkSession, root: String): Double = {
    val (v, entries) = latest(spark, root)
    if (v == 0 || entries.isEmpty) 0.0
    else entries.values
      .map(dirsOf(_).count(d => runLevel(d.takeWhile(_ != '/')) == 0))
      .sum.toDouble / entries.size
  }

  /** Default reader-retention horizon for [[vacuum]]: a reader that
    * pinned a manifest is guaranteed its files for this long AFTER the
    * manifest is superseded. 10 minutes covers any sane scan at this
    * table's scale; a deployment with long-running readers raises it
    * (the Delta-style knob — its default there is 7 days). */
  val DefaultVacuumRetainMs: Long = 10L * 60L * 1000L

  /** Drop version dirs no longer referenced by the latest manifest (and
    * superseded manifests). Safe to run concurrently with a writer: an
    * unreferenced dir at least as new as the latest manifest may be an
    * IN-FLIGHT [[stage]] (its manifest doesn't exist yet), so only dirs
    * strictly older than the current manifest — provably abandoned or
    * superseded — are deleted. Crash debris therefore survives one
    * vacuum and is collected after the next successful commit.
    *
    * READER RETENTION CONTRACT (r8): a reader pins a version by taking
    * the latest manifest at scan start ([[latest]]/[[readAt]]); its
    * files must outlive the scan even if a writer commits and vacuums
    * meanwhile. A superseded manifest vi is therefore only collected —
    * with the version dirs ONLY it references — once it has been stale
    * for at least `retainMs`, where "stale since" is the commit time
    * (mtime) of the manifest that superseded it (v_{i+1}). Within the
    * horizon, vi's referenced dirs AND vi's manifest file both survive,
    * so an in-flight reader of vi (and a [[readAt]] time-travel to vi)
    * stays consistent. The contract is: readers complete within
    * `retainMs` of being superseded, or re-pin and retry on
    * FileNotFound — the same contract Delta's vacuum retention defines.
    * `retainMs = 0` restores eager collection (tests, offline rebuilds).
    */
  def vacuum(spark: SparkSession, root: String,
      retainMs: Long = DefaultVacuumRetainMs): Unit = {
    val f = fs(spark, root)
    val (v, entries) = latest(spark, root)
    if (v == 0) return
    val manifestMtime =
      f.getFileStatus(new Path(logDir(root), manifestName(v))).getModificationTime
    val now = System.currentTimeMillis()
    // superseded manifests still inside the retention horizon: vi is
    // stale since mtime(manifest v_{i+1}); protect vi (and its dirs)
    // until now - staleSince >= retainMs
    val versions = f.listStatus(new Path(logDir(root)))
      .map(_.getPath.getName).filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong).sorted
    val staleSince: Map[Long, Long] = versions.zip(versions.drop(1)).map {
      case (vi, vnext) =>
        vi -> f.getFileStatus(new Path(logDir(root), manifestName(vnext))).getModificationTime
    }.toMap
    val retained = versions.filter(vi =>
      vi < v && staleSince.get(vi).exists(t => now - t < retainMs))
    val live = (entries.values.flatMap(dirsOf) ++ retained.flatMap { vi =>
      parseManifest(f, new Path(logDir(root), manifestName(vi))).values.flatMap(dirsOf)
    }).map(_.takeWhile(_ != '/')).toSet
    f.listStatus(new Path(root)).foreach { st =>
      val p = st.getPath
      if (p.getName.startsWith("v") && !live.contains(p.getName) && p.getName != "_txlog" &&
          st.getModificationTime < manifestMtime)
        f.delete(p, true)
    }
    val retainedSet = retained.toSet
    f.listStatus(new Path(logDir(root))).foreach { st =>
      val p = st.getPath
      val n = p.getName
      // both tmp shapes: legacy "N.manifest.tmp" and casManifest's
      // nonce'd "N.manifest.<nonce>.tmp". Same modification-time grace
      // as data dirs: a tmp at least as new as the latest manifest may
      // be a concurrent casManifest between create and link — deleting
      // it would abort that writer's allowed commit. Older tmps are
      // provably crash debris (their publish either won long ago or died).
      if (n.endsWith(".tmp") && n.contains(".manifest")) {
        if (st.getModificationTime < manifestMtime) f.delete(p, false)
      } else if (n.endsWith(".manifest") &&
          n.stripSuffix(".manifest").toLong < v &&
          !retainedSet.contains(n.stripSuffix(".manifest").toLong))
        f.delete(p, false)
    }
  }
}
