package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Offers

/** DataSourceV2 realization of the reference's scraper/format registry
  * (S3, `/root/reference/DataExtract/extract_data.py:266-269`):
  * `spark.read.format("graft-offers").load(baseDir)` over a snapshot
  * lake laid out `site=<s>/region=<r>/experience=<e>/<files>`, one
  * wholetext HTML snapshot per file. Emits one row per OFFER: the three
  * partition columns plus the raw P1/P2 fragments; normalization to the
  * 6-column offer schema stays in the expression layer
  * ([[graft.sources.OffersV2.offers]]) so it is codegen'd.
  *
  * The F1 source-side filters (extract_data.py:47-51 — the site/city/
  * experience the scraper bakes into the URL) PUSH DOWN: EqualTo/In on
  * the partition columns prune directories before any file is listed or
  * read, and surface in the plan via `description()` as `PushedFilters`.
  * Column pruning (`SupportsPushDownRequiredColumns`) reaches the
  * reader, which materializes only the requested fields.
  *
  * 100 TB notes: one input partition per snapshot file — snapshots are
  * small (one scrape round each) and embarrassingly parallel, so file
  * granularity IS the right split; directory pruning means a one-leaf
  * read opens exactly that leaf, the reference's "navigate straight to
  * the leaf dir". Partition values are taken verbatim from the dir
  * names (no URL-decoding — the lake writer and this reader share the
  * convention).
  */
final class OffersDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-offers"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OffersTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-offers requires .load(<lake dir>)"))
    new OffersTable(path)
  }
}

object OffersTable {
  val partitionCols: Seq[String] = Seq("site", "region", "experience")

  /** Unified raw-fragment schema across both site formats: `salary_raw`
    * carries the pracuj.pl salary span, `spans` the justjoin.it span
    * list; the one not applicable to a row's site is null.
    */
  val schema: StructType = StructType(Seq(
    StructField("site", StringType, nullable = false),
    StructField("region", StringType, nullable = false),
    StructField("experience", StringType, nullable = false),
    StructField("position_raw", StringType),
    StructField("company_raw", StringType),
    StructField("salary_raw", StringType),
    StructField("spans", ArrayType(StringType))))
}

final class OffersTable(base: String) extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-offers(`$base`)"
  override def schema(): StructType = OffersTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OffersScanBuilder(base, options)
  /** S4 snapshot sink at the connector layer — see [[OffersWriteBuilder]]. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new OffersWriteBuilder(base, info)
}

final class OffersScanBuilder(base: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = OffersTable.schema

  /** Streaming admission control: bound how many snapshot files one
    * trigger may admit (Spark's own file source convention). Batch reads
    * ignore it.
    */
  private val maxFilesPerTrigger: Option[Int] = {
    val v = options.getInt("maxFilesPerTrigger", -1)
    if (v == -1) None
    else if (v <= 0)
      throw new IllegalArgumentException(s"maxFilesPerTrigger must be positive, got $v")
    else Some(v)
  }

  /** How many discovery rounds the streaming write-ahead log accrues
    * before collapsing into one snapshot file (`option(
    * "logCompactInterval", n)`) — Spark's own file-source log compacts
    * the same way. Batch reads ignore it.
    */
  private val logCompactInterval: Int = {
    val v = options.getInt("logCompactInterval", 10)
    if (v < 1)
      throw new IllegalArgumentException(s"logCompactInterval must be positive, got $v")
    v
  }

  /** Accept exactly the filters directory pruning can answer completely
    * (equality/membership on the partition columns — string partition
    * values are never null, so IsNotNull is vacuously true); everything
    * else is returned as a residual for Spark to evaluate post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo(a, _: String) => OffersTable.partitionCols.contains(a)
      case In(a, vs) =>
        OffersTable.partitionCols.contains(a) && vs.forall(_.isInstanceOf[String])
      case IsNotNull(a) => OffersTable.partitionCols.contains(a)
      case _ => false
    }
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown — the S1 scroll cap (`max_rounds`,
    * extract_data.py:115) as a query op: each snapshot reader stops
    * PARSING after `limit` offers (a snapshot can hold thousands), and
    * partition planning keeps only the first `limit` files since one
    * file yields ≥1 row... conservatively ALL files are kept (a file may
    * yield 0 rows) but each emits at most `limit`. Partial pushdown:
    * Spark still applies the global limit on top.
    */
  private var limit: Option[Int] = None
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = true

  /** COUNT(*) pushdown, optionally grouped by partition columns — the
    * reported-total read (X8, extract_data.py:122-126) as a query op: a
    * `SELECT count(*) ... GROUP BY site` never materializes offer rows.
    * Each snapshot reader emits ONE row (group values + marker-match
    * count); partial pushdown, so Spark sums the per-file partials —
    * grouped counts stay exact because every row of a file shares the
    * file's partition values.
    */
  private var agg: Option[(Seq[String], Int)] = None
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val countsOnly = aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall(_.isInstanceOf[CountStar])
    val groupCols = aggregation.groupByExpressions.toSeq.map {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head).filter(OffersTable.partitionCols.contains)
      case _ => None
    }
    if (!countsOnly || groupCols.exists(_.isEmpty)) false
    else {
      agg = Some((groupCols.flatten, aggregation.aggregateExpressions.length))
      true
    }
  }

  /** Opt-in storage-partitioned execution (`option("spj", true)`): the
    * scan reports its lake-leaf clustering so joins/aggregations on the
    * partition columns plan WITHOUT an Exchange (needs
    * `spark.sql.sources.v2.bucketing.enabled=true` too). Opt-in rather
    * than always-on because key-grouping trades intra-leaf read
    * parallelism (same-leaf files merge into one task) for
    * shuffle-freedom — the right trade for leaf-keyed analytics, the
    * wrong one for a plain full scan — and because runtime-filter
    * narrowing (q214's DPP path) must never race a grouped plan's
    * pinned partition values.
    */
  private val spj: Boolean = options.getBoolean("spj", false)

  override def build(): Scan =
    new OffersScan(base, pushed, required, maxFilesPerTrigger, limit, agg,
      logCompactInterval, spj)
}

final class OffersScan(base: String, pushed: Array[Filter], required: StructType,
    maxFilesPerTrigger: Option[Int] = None, limit: Option[Int] = None,
    agg: Option[(Seq[String], Int)] = None, logCompactInterval: Int = 10,
    spj: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  /** The SESSION's Hadoop conf (spark.hadoop.* settings, credentials),
    * captured driver-side and shipped to the executor readers — a bare
    * `new Configuration()` would silently miss session-provided s3a://
    * credentials (the checkpoint-log FS learned this first).
    */
  @transient private lazy val hadoopConf =
    new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  /** With an aggregation pushed, the scan's output IS the partial-agg
    * schema: group columns (all strings — partition values) followed by
    * one bigint per COUNT(*).
    */
  private val outSchema: StructType = agg match {
    case Some((groupCols, nCounts)) => StructType(
      groupCols.map(c => StructField(c, StringType, nullable = false)) ++
        (1 to nCounts).map(i =>
          StructField(s"count_$i", org.apache.spark.sql.types.LongType,
            nullable = false)))
    case None => required
  }

  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-offers $base PushedFilters: [${pushed.mkString(", ")}], " +
      limit.map(l => s"PushedLimit: $l, ").getOrElse("") +
      agg.map { case (g, _) =>
        s"PushedAggregation: [COUNT(*)] GroupBy: [${g.mkString(", ")}], "
      }.getOrElse("") +
      s"ReadSchema: ${outSchema.catalogString}"

  /** Compile-time + runtime filters, merged. Runtime filters arrive via
    * [[filter]] after the build side of a join has executed (dynamic
    * partition pruning for this source): the next walk prunes with them.
    */
  @volatile private var effective: Array[Filter] = pushed
  @volatile private var cachedWalk: Seq[(OffersInputPartition, Long)] = null

  override def filterAttributes(): Array[NamedReference] =
    OffersTable.partitionCols.map(Expressions.column).toArray

  override def filter(filters: Array[Filter]): Unit = {
    // Best-effort: keep the shapes the walk can answer; anything else is
    // ignored (the join that produced the filter re-applies it anyway).
    val usable = filters.filter {
      case EqualTo(a, _: String) => OffersTable.partitionCols.contains(a)
      case In(a, vs) =>
        OffersTable.partitionCols.contains(a) && vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    if (usable.nonEmpty) synchronized {
      effective = effective ++ usable
      // NARROW the already-planned file list — never re-walk: a re-list
      // could admit snapshot files that landed between initial planning
      // and runtime-filter arrival, so the DPP-filtered side of a join
      // would read newer lake state than the rest of the query. Runtime
      // filtering may only shrink what was originally planned.
      if (cachedWalk != null)
        cachedWalk = cachedWalk.filter { case (p, _) => OffersScan.matches(usable, p) }
    }
  }

  /** Directory walk with pruning at each level: a filtered-out site dir
    * is never even listed for regions — the file index cost scales with
    * the SELECTED leaves, not the lake. One walk serves both planning
    * and statistics; runtime filters invalidate it.
    */
  private def selected: Seq[(OffersInputPartition, Long)] = {
    var w = cachedWalk
    if (w == null) synchronized {
      w = cachedWalk
      if (w == null) {
        w = OffersScan.walk(base, effective, hadoopConf.value); cachedWalk = w
      }
    }
    w
  }

  override def planInputPartitions(): Array[InputPartition] =
    selected.map(_._1).toArray

  /** Storage-partitioned execution: with `option("spj", true)` the scan
    * reports the lake's OWN clustering — every input partition is one
    * snapshot file inside a `site=/region=/experience=` leaf, so the
    * leaf key IS a `KeyGroupedPartitioning` over identity transforms of
    * the partition columns ([[OffersInputPartition.partitionKey]]
    * carries the values). Spark then groups same-leaf files into one
    * task and plans leaf-keyed joins and aggregations with NO Exchange —
    * two reads of 100 TB lakes join leaf-against-leaf without shuffling
    * either side (q236). Only reported when the output schema still
    * carries all three partition columns (otherwise the identity
    * transforms cannot resolve and the partitioning would be vacuous).
    */
  override def outputPartitioning(): Partitioning = {
    val outCols = outSchema.fieldNames.toSet
    if (spj && OffersTable.partitionCols.forall(outCols.contains))
      new KeyGroupedPartitioning(
        OffersTable.partitionCols.map(c =>
          Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression).toArray,
        selected.size)
    else new UnknownPartitioning(selected.size)
  }

  /** Post-pushdown size = bytes of the SELECTED snapshot files only, so
    * Catalyst sees a one-leaf read as small — which is what lets a
    * filtered offers dimension auto-broadcast in a join instead of
    * shuffling the fact side. With an aggregation pushed the output is
    * one row per file regardless of snapshot bytes — report THAT, so a
    * counted dimension broadcasts too.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong = agg match {
      case Some((groupCols, nCounts)) =>
        val rowBytes = groupCols.size * 16L + nCounts * 8L + 16L
        java.util.OptionalLong.of(math.max(1L, selected.size * rowBytes))
      case None =>
        java.util.OptionalLong.of(math.max(1L, selected.map(_._2).sum))
    }
    override def numRows(): java.util.OptionalLong = agg match {
      case Some(_) => java.util.OptionalLong.of(selected.size.toLong)
      case None => java.util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = agg match {
    case Some((groupCols, nCounts)) =>
      new OffersCountReaderFactory(groupCols, nCounts, hadoopConf)
    case None => new OffersReaderFactory(required.fieldNames, limit, hadoopConf)
  }

  /** Task-level observability (SQL UI / metrics sinks): how many
    * snapshot files each task opened and how many offers it emitted —
    * the numbers an operator watches to spot a lake leaf gone skewed or
    * a scrape round that parsed to nothing.
    */
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new SnapshotFilesReadMetric, new OffersEmittedMetric)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new OffersMicroBatchStream(base, pushed, required, maxFilesPerTrigger,
      checkpointLocation, logCompactInterval)
}

object OffersScan {
  /** Executor-side snapshot read shared by the row and count readers:
    * one change to charset/decompression/conf handling serves both, so
    * the count kernel and the row parser can never diverge on what
    * bytes they see.
    */
  private[v2] def readSnapshot(file: String, conf: Configuration): String = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Does a partition's (site, region, experience) satisfy every pushed
    * filter? The post-hoc twin of [[walk]]'s per-level pruning — used to
    * narrow an already-planned file list when runtime filters arrive.
    */
  private[v2] def matches(filters: Array[Filter], p: OffersInputPartition): Boolean = {
    def v(colName: String): String = colName match {
      case "site" => p.site
      case "region" => p.region
      case "experience" => p.experience
      case _ => null
    }
    filters.forall {
      case EqualTo(a, x: String) if v(a) != null => v(a) == x
      case In(a, vs) if v(a) != null => vs.contains(v(a))
      case _ => true
    }
  }

  /** The pruned lake walk shared by the batch scan and the micro-batch
    * stream: descend `site=/region=/experience=` one level at a time,
    * dropping any directory a pushed filter rules out BEFORE listing its
    * children. Leaf files sort by path so the walk is deterministic for
    * a given lake state.
    */
  private[v2] def walk(base: String, pushed: Array[Filter],
      conf: Configuration): Seq[(OffersInputPartition, Long)] = {
    def keep(colName: String, value: String): Boolean = pushed.forall {
      case EqualTo(a, v) if a == colName => v == value
      case In(a, vs) if a == colName => vs.contains(value)
      case _ => true
    }
    val fs = new Path(base).getFileSystem(conf)
    def subdirs(p: Path, colName: String): Seq[(Path, String)] =
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(colName + "="))
        .map(s => s.getPath -> s.getPath.getName.stripPrefix(colName + "="))
        .filter { case (_, v) => keep(colName, v) }
    val files = for {
      (sDir, site) <- subdirs(new Path(base), "site")
      (rDir, region) <- subdirs(sDir, "region")
      (eDir, exp) <- subdirs(rDir, "experience")
      f <- fs.listStatus(eDir).toSeq
      name = f.getPath.getName
      if f.isFile && f.getLen > 0 && !name.startsWith("_") && !name.startsWith(".")
    } yield OffersInputPartition(f.getPath.toString, site, region, exp) -> f.getLen
    files.sortBy(_._1.file)
  }
}

/** The S1/S2 scroll loop as a stream: every snapshot file that LANDS in
  * the lake is the next scrape round. The offset is an index into an
  * append-only, discovery-ordered file list — `latestOffset` re-walks
  * the (pruned) lake and appends unseen files, so a micro-batch is
  * exactly "the files that arrived since the last trigger", each read
  * by the same executor-side parser as the batch scan.
  *
  * F1 pushdown applies identically to the stream: a `site=` filter
  * prunes directories during EVERY discovery walk, so a one-leaf
  * subscription never lists the rest of the lake.
  *
  * The discovered-file list PERSISTS in the checkpoint (one
  * `<n>.round` file per discovery round under `graft-offers-files/`,
  * written BEFORE the in-memory list grows — the same write-ahead
  * file-log discipline Spark's own file source keeps): a restarted
  * query rebuilds the exact discovery order, so offsets recorded in
  * the offset log replay the exact same snapshot files even when
  * later-landing files sort lexicographically between earlier ones.
  * Discovery cost per trigger is one pruned listing (driver-side,
  * proportional to selected leaves).
  */
final class OffersMicroBatchStream(base: String, pushed: Array[Filter], required: StructType,
    maxFilesPerTrigger: Option[Int] = None, checkpointLocation: String = "",
    logCompactInterval: Int = 10)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val discovered = scala.collection.mutable.ArrayBuffer.empty[OffersInputPartition]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  // The lake and the checkpoint can live on any FileSystem (s3a://,
  // hdfs://) whose credentials arrive via spark.hadoop.* — capture the
  // SESSION's Hadoop conf once (driver-side), the way Spark's own
  // file-source log does; a bare `new Configuration()` would miss them.
  // Serializable so the executor-side readers get the same conf.
  private val hconf = new org.apache.spark.util.SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  private val logDir: Option[Path] =
    Option(checkpointLocation).filter(_.nonEmpty)
      .map(c => new Path(c, "graft-offers-files"))
  private lazy val logFs = logDir.map(_.getFileSystem(hconf.value))
  private var rounds = 0

  // Restart: replay the newest compacted snapshot (if any), then the
  // per-round write-ahead files past it, in order — `discovered` regains
  // the exact original discovery order (a fresh walk could interleave
  // later-landing files between earlier offsets).
  logDir.zip(logFs).foreach { case (dir, fs) =>
    if (fs.exists(dir)) {
      val entries = fs.listStatus(dir)
      def id(p: Path, suffix: String): Long =
        p.getName.stripSuffix(suffix).toLong
      val latestCompact = entries
        .filter(_.getPath.getName.endsWith(".compact"))
        .sortBy(st => id(st.getPath, ".compact"))
        .lastOption
      val compactId = latestCompact.fold(-1L)(st => id(st.getPath, ".compact"))
      val tail = entries
        .filter(st => st.getPath.getName.endsWith(".round") &&
          id(st.getPath, ".round") > compactId)
        .sortBy(st => id(st.getPath, ".round"))
      (latestCompact.toSeq ++ tail).foreach { st =>
        val in = fs.open(st.getPath)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
          finally in.close()
        // 4-line framing: any misalignment means corruption, and a
        // silently shifted record would rotate fields into the wrong
        // slots — fail loudly instead
        require(lines.length % 4 == 0,
          s"corrupt discovery log ${st.getPath}: ${lines.length} lines " +
            "(not a multiple of 4)")
        lines.grouped(4).foreach { case Vector(f, s, r, e) =>
          if (seen.add(f)) discovered += OffersInputPartition(f, s, r, e)
        }
      }
      rounds = math.max(compactId.toInt + 1,
        tail.lastOption.fold(0)(st => id(st.getPath, ".round").toInt + 1))
    }
  }

  private def discover(): Unit = synchronized {
    // Within one round, new files append in path order — deterministic
    // for a fixed sequence of lake states.
    val fresh = OffersScan.walk(base, pushed, hconf.value).collect {
      case (p, _) if !seen.contains(p.file) => p
    }
    if (fresh.nonEmpty) {
      // write-ahead: the round file lands (atomic temp+rename) before
      // the in-memory list grows, so no offset can ever reference a
      // file a restart would not rediscover in the same position
      logDir.zip(logFs).foreach { case (dir, fs) =>
        fs.mkdirs(dir)
        val target = new Path(dir, s"$rounds.round")
        val tmp = new Path(dir, s".$rounds.round.tmp")
        val out = fs.create(tmp, true)
        try out.write(fresh.flatMap(p =>
          Seq(p.file, p.site, p.region, p.experience)).mkString("\n")
          .getBytes("UTF-8"))
        finally out.close()
        // rename returns false (not an exception) on several
        // FileSystems; an unlogged round would void exactly-once
        // SILENTLY, so check it
        require(fs.rename(tmp, target),
          s"could not commit discovery log $target — refusing to admit " +
            "files the checkpoint would not replay")
      }
      rounds += 1
      fresh.foreach { p => seen += p.file; discovered += p }
      // Every `logCompactInterval` rounds, collapse the accrued per-round
      // files into ONE snapshot — without this a months-old subscription
      // keeps thousands of tiny log files and restart replays them all
      // (O(total files ever discovered) restart cost, unbounded
      // checkpoint growth).
      if (rounds % logCompactInterval == 0)
        logDir.zip(logFs).foreach { case (dir, fs) => compactLog(dir, fs) }
    }
  }

  /** Write `<rounds-1>.compact` holding the FULL discovery order (same
    * 4-line framing and atomic temp+rename as the round files), then
    * delete the `.round` files and older compacts it covers. A failed
    * rename is harmless — the covered rounds still replay, so this skips
    * (deleting only the temp) and retries at the next interval; covered
    * files are deleted strictly AFTER the rename lands, so no log state
    * is ever lost.
    */
  private def compactLog(dir: Path, fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val cid = rounds - 1L
    val target = new Path(dir, s"$cid.compact")
    val tmp = new Path(dir, s".$cid.compact.tmp")
    val out = fs.create(tmp, true)
    try out.write(discovered.flatMap(p =>
      Seq(p.file, p.site, p.region, p.experience)).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.rename(tmp, target)) {
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        val covered =
          (n.endsWith(".round") && n.stripSuffix(".round").toLong <= cid) ||
            (n.endsWith(".compact") && n.stripSuffix(".compact").toLong < cid)
        if (covered) fs.delete(st.getPath, false)
      }
    } else fs.delete(tmp, false)
  }

  override def initialOffset(): Offset = OffersOffset(0L)
  override def deserializeOffset(json: String): Offset = OffersOffset(json.trim.toLong)
  override def latestOffset(): Offset = { discover(); OffersOffset(discovered.size.toLong) }

  /** Admission control (`option("maxFilesPerTrigger", n)`): a trigger
    * admits at most n newly-discovered snapshot files, so a backlog (a
    * resumed subscription over months of scrape rounds) drains in
    * bounded, spill-safe batches instead of one giant catch-up batch —
    * the stream analog of sizing `files.maxPartitionBytes`.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    discover()
    val from = start.asInstanceOf[OffersOffset].index
    val cap = limit match {
      case m: ReadMaxFiles => math.min(discovered.size.toLong, from + m.maxFiles())
      case _ => discovered.size.toLong
    }
    OffersOffset(cap)
  }

  override def reportLatestOffset(): Offset = synchronized {
    OffersOffset(discovered.size.toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[OffersOffset].index.toInt
      val e = end.asInstanceOf[OffersOffset].index.toInt
      if (e > discovered.size) {
        // A pending batch replayed before any trigger ran discovery —
        // either a checkpoint from before the file log existed
        // (migration: the walk's path order IS the order the old code
        // rebuilt) or a restart whose pending batch outruns the log.
        // One discovery seeds the list (and starts the log); if the
        // offset STILL exceeds it, the lake lost files the offset log
        // promised — failing loudly beats committing an empty batch.
        discover()
        require(e <= discovered.size,
          s"offset $e exceeds the ${discovered.size} discoverable files" +
            logDir.fold(" (no checkpoint file log)")(d => s" (log: $d)") +
            " — the lake no longer holds files the checkpoint committed")
      }
      discovered.slice(s, e).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new OffersReaderFactory(required.fieldNames, None, hconf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Monotone index into the discovery-ordered snapshot-file list. */
final case class OffersOffset(index: Long) extends Offset {
  override def json: String = index.toString
}

final case class OffersInputPartition(
    file: String, site: String, region: String, experience: String)
  extends InputPartition with HasPartitionKey {
  /** The lake-leaf key, in [[OffersTable.partitionCols]] order — what
    * lets Spark GROUP same-leaf snapshot files into one task and plan
    * storage-partitioned joins/aggregations over the leaf keys with no
    * Exchange (see [[OffersScan.outputPartitioning]]).
    */
  override def partitionKey(): InternalRow = new GenericInternalRow(
    Array[Any](UTF8String.fromString(site), UTF8String.fromString(region),
      UTF8String.fromString(experience)))
}

final class SnapshotFilesReadMetric extends CustomSumMetric {
  override def name(): String = "snapshotFilesRead"
  override def description(): String = "snapshot files read"
}

final class OffersEmittedMetric extends CustomSumMetric {
  override def name(): String = "offersEmitted"
  override def description(): String = "offer rows emitted (or counted)"
}

private[v2] final case class OffersTaskMetric(metricName: String, v: Long)
    extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = v
}

/** Partial-COUNT(*) reader: one output row per snapshot file — the
  * group-by partition values plus the marker-match offer count
  * ([[Offers.countOffers]]) — no offer row is ever materialized.
  */
final class OffersCountReaderFactory(groupCols: Seq[String], nCounts: Int,
    conf: org.apache.spark.util.SerializableConfiguration =
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())))
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val p = partition.asInstanceOf[OffersInputPartition]
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (emitted) false
        else {
          val n = Offers.countOffers(p.site, OffersScan.readSnapshot(p.file, conf.value))
          val groupVals = groupCols.map[Any] {
            case "site" => UTF8String.fromString(p.site)
            case "region" => UTF8String.fromString(p.region)
            case "experience" => UTF8String.fromString(p.experience)
            case other => throw new IllegalStateException(s"unknown group col $other")
          }
          row = new GenericInternalRow(
            (groupVals ++ Seq.fill[Any](nCounts)(n)).toArray)
          counted = n
          emitted = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
      private var counted = 0L
      override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
        OffersTaskMetric("snapshotFilesRead", if (emitted) 1L else 0L),
        OffersTaskMetric("offersEmitted", counted))
    }
}

final class OffersReaderFactory(fields: Array[String], limit: Option[Int] = None,
    conf: org.apache.spark.util.SerializableConfiguration =
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())))
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OffersPartitionReader(partition.asInstanceOf[OffersInputPartition], fields,
      limit, conf)
}

/** Executor-side reader: one wholetext snapshot → N offer rows via the
  * same pure per-document parsers the typed source uses
  * ([[graft.sources.Offers.parsePracujDoc]]/[[graft.sources.Offers.parseJjitDoc]]
  * — P3 dispatch on the `site=` dir value). Only the pruned fields are
  * materialized.
  */
final class OffersPartitionReader(p: OffersInputPartition, fields: Array[String],
    limit: Option[Int] = None,
    conf: org.apache.spark.util.SerializableConfiguration =
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.getActiveSession
          .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())))
    extends PartitionReader[InternalRow] {

  private val iter: Iterator[InternalRow] = {
    val html = OffersScan.readSnapshot(p.file, conf.value)
    def str(s: String) = UTF8String.fromString(s)
    def row(pos: String, comp: String, salary: String, spans: Seq[String]): InternalRow =
      new GenericInternalRow(fields.map[Any] {
        case "site" => str(p.site)
        case "region" => str(p.region)
        case "experience" => str(p.experience)
        case "position_raw" => str(pos)
        case "company_raw" => str(comp)
        case "salary_raw" => if (salary == null) null else str(salary)
        case "spans" =>
          if (spans == null) null
          else new GenericArrayData(spans.map(s => str(s): Any).toArray)
        case other => throw new IllegalStateException(s"unknown column $other")
      })
    val parsed = p.site match {
      case "pracujplit" => Offers.parsePracujDoc(html)
        .map(r => row(r.position_raw, r.company_raw, r.salary_raw, null))
      case "justjoinit" => Offers.parseJjitDoc(html)
        .map(r => row(r.position_raw, r.company_raw, null, r.spans))
      case other =>
        throw new IllegalArgumentException(s"unsupported job site dir: site=$other")
    }
    // Pushed LIMIT: stop parsing this snapshot once enough offers are
    // out (partial pushdown — Spark applies the global limit on top).
    limit.fold(parsed)(parsed.take)
  }

  private var cur: InternalRow = _
  private var emitted = 0L
  override def next(): Boolean =
    if (iter.hasNext) { cur = iter.next(); emitted += 1; true } else false
  override def get(): InternalRow = cur
  override def close(): Unit = ()
  override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
    OffersTaskMetric("snapshotFilesRead", 1L),
    OffersTaskMetric("offersEmitted", emitted))
}
