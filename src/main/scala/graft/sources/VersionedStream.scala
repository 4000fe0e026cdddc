package graft.sources.v2

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Versioned

/** The VERSIONED TABLE as a STREAMING SOURCE — Delta's
  * `readChangeFeed`-as-a-Source shape over the manifest log, replacing
  * q273's hand-rolled drain loop with a real `MicroBatchStream`:
  *
  * {{{
  *   spark.readStream.format("graft-versioned")
  *     .option("path", dir)
  *     .option("startingVersion", 1)   // default: the current version
  *     .load()
  * }}}
  *
  * OFFSETS are version numbers: a micro-batch (vA → vB] carries, for
  * every consecutive committed pair in the range, the rows of the data
  * files UNIQUE to each side of the pair (COW + immutable files make
  * the pair diff a manifest operation — scan cost ∝ changed data,
  * never table size; the [[Versioned.changesBetween]] argument). Rows
  * surface under the table's logical schema plus three metadata
  * columns: `_change_side` ('old' = file removed at the pair's TO
  * version, 'new' = file added), `_from_v`, `_to_v`. A consumer
  * classifies per (pair, key) in `foreachBatch` — old-only = delete,
  * new-only = insert, both-differing = update, both-identical = a COW
  * carry to drop (exactly the q273/q280 arbitration, now distributed
  * over one partition PER CHANGED FILE instead of a driver loop).
  *
  * The executor readers decode parquet through the public
  * parquet-hadoop Group API (no Spark-internal reader classes), with
  * the era recipe (rename mapping, added-later nulls, widened casts)
  * computed DRIVER-side at planning and shipped per file — so mixed-era
  * histories stream correctly. Loud-failure contracts, in the Delta
  * streaming-source tradition:
  *   - a schema-evolution commit AFTER stream start fails the stream
  *     (restart to pick up the new schema);
  *   - MOR delete sidecars STREAM as delete events (q318): a pair
  *     that adds `#dv` rows emits exactly the deleted rows old-side
  *     (each decoded through its file's own era recipe), file diffs
  *     emit each side's LIVE rows (the side's sidecars applied — a
  *     compaction after deletes never re-emits a delete);
  *   - column types outside the flat interchange set (integral, fp,
  *     boolean, string, binary, date, timestamp) are rejected at
  *     stream creation, not mid-flight.
  */
final class VersionedStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-versioned"

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-versioned requires option(\"path\", <table dir>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VersionedStreamTable.streamSchema(
      SparkSession.active, dirOf(options),
      Option(options.get("branch")))

  // the WRITE path hands us the query's schema (a sink to a fresh dir
  // has no table to infer from); the READ path still infers
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VersionedStreamTable(
      Option(properties.get("path")).getOrElse(throw new IllegalArgumentException(
        "graft-versioned requires option(\"path\", <table dir>)")),
      Option(properties.get("startingVersion")).map(_.toLong),
      Option(properties.get("maxVersionsPerTrigger")).map { s =>
        val m = s.toInt
        require(m > 0, s"maxVersionsPerTrigger must be positive, got $m")
        m
      },
      Option(schema),
      Option(properties.get("branch")))
}

object VersionedStreamTable {
  val MetaCols: Seq[StructField] = Seq(
    StructField("_change_side", StringType, nullable = false),
    StructField("_from_v", LongType, nullable = false),
    StructField("_to_v", LongType, nullable = false))

  private[v2] val Supported: Set[Class[_]] = Set(
    classOf[ByteType], classOf[ShortType], classOf[IntegerType],
    classOf[LongType], classOf[FloatType], classOf[DoubleType],
    classOf[BooleanType], classOf[StringType], classOf[BinaryType],
    classOf[DateType], classOf[TimestampType], classOf[TimestampNTZType])

  def streamSchema(spark: SparkSession, dir: String,
      branch: Option[String] = None): StructType = {
    val logical = branch match {
      case Some(b) => Versioned.readBranch(spark, dir, b).schema
      case None =>
        val latest = Versioned.latestVersion(spark, dir).getOrElse(
          throw new IllegalStateException(s"$dir is not a versioned table"))
        Versioned.readVersion(spark, dir, latest).schema
    }
    logical.fields.foreach { f =>
      require(Supported.exists(_.isInstance(f.dataType)),
        s"graft-versioned cannot stream column '${f.name}' of type " +
          s"${f.dataType.catalogString} — the flat interchange set is " +
          "integral/fp/boolean/string/binary/date/timestamp")
    }
    StructType(logical.fields.toSeq ++ MetaCols)
  }
}

final class VersionedStreamTable(dir: String, startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Int] = None,
    externalSchema: Option[StructType] = None,
    branch: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  // the stream's SCHEMA BASELINE, pinned EAGERLY when the source is
  // DEFINED (readStream.load()), not when each query run starts — so
  // an evolution commit racing the query startup still fails loudly
  // instead of being silently adopted. None only for a WRITE-only
  // table on a not-yet-created dir (the sink's CREATE case), which the
  // read path rejects below. A branch baseline is the branch HEAD's
  // (== its base's — branches never evolve schema).
  private val changes0AtDefinition: Option[Seq[(Int, String, String, String)]] = {
    val spark = SparkSession.active
    branch match {
      case Some(b) => Some(Versioned.branchHead(spark, dir, b)._1.changes)
      case None => Versioned.latestVersion(spark, dir)
        .map(v => Versioned.manifestOf(spark, dir, v).changes)
    }
  }
  private def changes0 = changes0AtDefinition.getOrElse(
    throw new IllegalStateException(s"$dir is not a versioned table"))
  override def name(): String =
    s"graft-versioned(`$dir`)" + branch.fold("")(b => s"@$b")
  override def schema(): StructType =
    if (branch.isDefined ||
      Versioned.latestVersion(SparkSession.active, dir).isDefined)
      VersionedStreamTable.streamSchema(SparkSession.active, dir, branch)
    else externalSchema.getOrElse(throw new IllegalStateException(
      s"$dir is not a versioned table"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ, TableCapability.STREAMING_WRITE)

  /** The STREAMING SINK half ([[VersionedStreamingWrite]]): every
    * micro-batch appends as ONE manifest commit, exactly-once by the
    * `#txn` (queryId, epoch) watermark. Append mode only — update and
    * complete need semantics (keyed upsert / truncate) a log-structured
    * append sink must not fake, and Spark rejects them against these
    * capabilities on its own.
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(branch.isEmpty,
      s"graft-versioned sink: streaming INTO a branch is not supported — " +
        "branches stage batch audits (INSERT INTO t.branch_<name>); " +
        "stream into the table and branch from the result instead")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            // a table declared PARTITIONED BY routes epochs through the
            // partitioned writer whichever surface reaches the sink —
            // by NAME (the catalog) or by PATH (here, spec from the
            // persisted graft.partition property)
            new VersionedStreamingWrite(dir, info.schema(), info.queryId(),
              Versioned.partitionSpecOf(SparkSession.active, dir))
          override def description(): String =
            s"graft-versioned streaming sink $dir"
        }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        private val out = schema()
        override def readSchema(): StructType = out
        override def description(): String =
          s"graft-versioned $dir change stream"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new VersionedChangeStream(dir, startingVersion, out, changes0,
            maxVersionsPerTrigger, branch = branch)

        /** BATCH change read (Delta's batch readChangeFeed):
          * `spark.read.format("graft-versioned").option("path", dir)
          * .option("changesFrom", 1)[.option("changesTo", 4)].load()`
          * — every pair in (from, to] as one bounded DataFrame, same
          * schema/partitioning/guards as the streaming side.
          */
        override def toBatch: org.apache.spark.sql.connector.read.Batch = {
          val spark = SparkSession.active
          require(branch.isEmpty,
            "batch change reads address MAIN versions — for a branch's " +
              "rows read t.branch_<name> (or Versioned.readBranch); for " +
              "its commit feed use readStream with option(\"branch\", ...)")
          val from = Option(options.get("changesFrom")).map(_.toLong)
            .getOrElse(throw new IllegalArgumentException(
              "batch change read requires option(\"changesFrom\", <version>)" +
                " (and optional changesTo; default = current version); for" +
                " the table's ROWS read the catalog table or Versioned.read"))
          val to = Option(options.get("changesTo")).map(_.toLong)
            .getOrElse(Versioned.latestVersion(spark, dir).getOrElse(
              throw new IllegalStateException(s"$dir is not a versioned table")))
          val vs = Versioned.versions(spark, dir)
          require(vs.contains(from) && vs.contains(to) && from <= to,
            s"changesFrom=$from, changesTo=$to must be committed versions " +
              s"of $dir in order (have ${vs.mkString(",")})")
          val dataFields = out.fields.toSeq
            .dropRight(VersionedStreamTable.MetaCols.size)
          val recipeFor = Versioned.eraRecipes(changes0,
            dataFields.map(f => (f.name, f.dataType)))
          val hconf = new org.apache.spark.util.SerializableConfiguration(
            spark.sessionState.newHadoopConf())
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] =
              VersionedChanges.partitions(spark, dir, from, to, changes0,
                recipeFor, Versioned.versions(spark, dir),
                p => if (p == 0L) Versioned.Manifest(Seq.empty, Seq.empty)
                  else Versioned.manifestOf(spark, dir, p),
                kn => dataFields.find(_.name == kn).map(_.dataType))
            override def createReaderFactory(): PartitionReaderFactory =
              new VersionedChangeReaderFactory(hconf)
          }
        }
      }
    }
}

/** Monotone offset into the commit history: "every pair up to and
  * including (v-1, v) has been emitted".
  */
final case class VersionOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** `bare = false` (the path-based `format("graft-versioned")` source):
  * rows of both pair sides with the three `_change_*` metadata
  * columns — a CDC feed the consumer classifies. `bare = true` (the
  * catalog `readStream.table` binding, [[VersionedScan]]): APPEND-ONLY
  * streaming of the table's own rows — only new-side files, no
  * metadata columns, and a pair that REMOVES a file (compaction, COW
  * rewrite, overwrite) fails the stream loudly (Delta's
  * ignoreChanges-off contract: silently re-emitting rewritten rows
  * would double-count them downstream; the path-based CDC source is
  * the surface that can represent such changes).
  */
final class VersionedChangeStream(dir: String, startingVersion: Option[Long],
    out: StructType,
    changes0: Seq[(Int, String, String, String)],
    maxVersionsPerTrigger: Option[Int] = None,
    bare: Boolean = false,
    branch: Option[String] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active
  private val hconf = new org.apache.spark.util.SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  private val dataFields: Seq[StructField] =
    if (bare) out.fields.toSeq
    else out.fields.toSeq.dropRight(VersionedStreamTable.MetaCols.size)

  /** The streamed LINEAGE (q311): main's committed versions, or — with
    * `branch` set — the branch's commit seqs, where offset 0 is the
    * BASE the branch was cut from. A branch stream is the AUDIT FEED:
    * the default start 0 emits the branch's own writes (pair (0,1) =
    * first staged batch), never the base snapshot — main streams the
    * base. A dropped/published branch fails the stream loudly at the
    * next offset resolution (the ref is gone; redefine the stream).
    */
  private def points: Seq[Long] = branch match {
    case None => Versioned.versions(spark, dir)
    case Some(b) =>
      require(Versioned.branches(spark, dir).contains(b),
        s"no branch '$b' on $dir — dropped or published; the branch " +
          "stream cannot continue (redefine the source)")
      Versioned.branchSeqs(spark, dir, b)
  }

  /** Resolve one lineage point to its manifest: 0 = the empty
    * pre-first-commit base (main) / the branch base (branch mode).
    */
  private def manifestAt(p: Long): Versioned.Manifest = branch match {
    case None =>
      if (p == 0L) Versioned.Manifest(Seq.empty, Seq.empty)
      else Versioned.manifestOf(spark, dir, p)
    case Some(b) => Versioned.branchManifestAt(spark, dir, b, p)
  }

  override def initialOffset(): Offset = {
    val vs = points
    val start = startingVersion.getOrElse(
      if (branch.isDefined) 0L else vs.last)
    // 0 = "from before the first commit" (the Delta startingVersion=0
    // shape): the first micro-batch carries the whole oldest version.
    // In branch mode 0 is the branch base — the audit feed's zero
    require(start == 0L || vs.contains(start),
      s"startingVersion $start does not exist in $dir (have ${vs.mkString(",")})")
    VersionOffset(start)
  }
  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)
  private def trueLatest: Long = branch match {
    case None => Versioned.latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a versioned table"))
    case Some(_) => points.lastOption.getOrElse(0L)
  }

  override def latestOffset(): Offset = VersionOffset(trueLatest)

  /** ADMISSION CONTROL (the Delta `maxFilesPerTrigger` shape, version-
    * keyed): a consumer catching up on a long commit history gets
    * bounded micro-batches of at most `maxVersionsPerTrigger` version
    * pairs instead of one giant batch — state-store pressure and
    * retry cost stay bounded at any backlog size. Under
    * Trigger.AvailableNow the end is PINNED at prepare time
    * ([[prepareForTriggerAvailableNow]]), so the drain terminates even
    * against a live writer, in several bounded batches.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(trueLatest)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset].v
    val cap = availableNowCap.getOrElse(trueLatest)
    // the throttled end WALKS the committed versions rather than
    // adding m arithmetically: tag-pinned vacuum leaves GAPS in the
    // version sequence (e.g. [1,5,6,7]), and a checkpointed offset
    // synthesized inside a gap would wedge the stream on a
    // nonexistent manifest — offsets must always land on committed
    // versions (or the start itself)
    val end = maxVersionsPerTrigger.fold(cap) { m =>
      points.filter(v => v > s && v <= cap)
        .take(m).lastOption.getOrElse(s)
    }
    VersionOffset(math.max(end, s))
  }

  override def reportLatestOffset(): Offset = VersionOffset(trueLatest)

  /** The per-file era recipe ([[Versioned.eraRecipes]], shared with the
    * row-level operation scan): for each stream data column, the file's
    * PHYSICAL column name ("" if the column was added after the file's
    * era — reads as NULL). Widen needs no entry: the reader converts by
    * the file's own primitive and the column's LOGICAL type.
    */
  private val recipeFor: Int => Array[(String, String, String)] =
    Versioned.eraRecipes(changes0,
      dataFields.map(f => (f.name, f.dataType)).toSeq)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val ps = VersionedChanges.partitions(spark, dir,
      start.asInstanceOf[VersionOffset].v, end.asInstanceOf[VersionOffset].v,
      changes0, recipeFor, points, manifestAt,
      kn => dataFields.find(_.name == kn).map(_.dataType))
    if (!bare) ps
    else {
      ps.collectFirst {
        case p: VersionedChangePartition if p.side == "old" =>
          throw new IllegalStateException(
            s"version pair (${p.fromV}, ${p.toV}) of $dir removes " +
              (if (p.dvOnly) "rows (a MOR delete)" else "data files " +
                "(a compaction / rewrite / overwrite)") +
              " — readStream.table streams appends only; restart from " +
              "a later startingVersion, or consume the change feed via " +
              "spark.readStream.format(\"graft-versioned\")")
      }
      ps
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedChangeReaderFactory(hconf, includeMeta = !bare)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The pair walk shared by the STREAMING source's micro-batches and the
  * BATCH change read: for every consecutive committed pair in
  * (from, to], one partition per data file UNIQUE to a side — scan
  * cost ∝ changed data, never table size.
  */
private[v2] object VersionedChanges {
  /** `points`/`manifestAt` select the lineage: main versions (0 = the
    * empty pre-first-commit base) or — the q311 branch stream — branch
    * seqs (0 = the branch's base manifest).
    *
    * MOR-AWARE (q318 — previously any dv-carrying pair failed with
    * "not readable as file diffs"): each side emits its LIVE rows —
    * file-diff partitions carry the side's own sidecar paths, and the
    * executor skips rows whose key sits in a sidecar set targeting its
    * file ([[ParquetGroups.dvKeySet]], the row-level scan machinery) —
    * and a pair that ADDS sidecar rows additionally emits those rows
    * as `old`-side DELETE events ([[VersionedChangePartition.dvOnly]]:
    * read the targeted file, emit ONLY rows whose key the new sidecars
    * delete). Scan cost stays ∝ changed data: dv-free pairs (the
    * steady state) attach nothing; a dv pair costs the targeted files
    * + sidecar reads — the same executor-side shape the row-level
    * scan documents. Compaction-after-deletes pairs (OPTIMIZE
    * retiring dvs) now stream correctly: the old side's raw rows are
    * filtered by the OLD side's sidecars, so an already-deleted row
    * never re-emits as a second delete.
    */
  def partitions(spark: SparkSession, dir: String, from: Long, to: Long,
      changes0: Seq[(Int, String, String, String)],
      recipeFor: Int => Array[(String, String, String)],
      points: Seq[Long],
      manifestAt: Long => Versioned.Manifest,
      keyTypeOf: String => Option[DataType] = _ => None): Array[InputPartition] = {
    val vs = points.filter(v => v > from && v <= to)
    // (current key name, era) → recipe for decoding that key in files
    // of that era; the key's LOGICAL type comes from the stream schema
    val keyRecipeCache = scala.collection.mutable.Map
      .empty[String, Int => Array[(String, String, String)]]
    def keyRecipe(kn: String, era: Int): (String, String, String) =
      keyRecipeCache.getOrElseUpdate(kn, {
        val dt = keyTypeOf(kn).getOrElse(throw new IllegalStateException(
          s"MOR delete key column '$kn' of $dir is not in the stream " +
            "schema — dropped after deletes? redefine the source"))
        Versioned.eraRecipes(changes0, Seq(kn -> dt))
      })(era).head
    def dvFiltersFor(m: Versioned.Manifest, refs: Seq[Versioned.DvRef],
        era: Int): Array[((String, String, String), Array[String])] =
      if (refs.isEmpty) Array.empty
      else refs.groupBy(d => Versioned.currentName(d.keyName, d.gen,
          m.renames)).toSeq.sortBy(_._1)
        .map { case (kn, rs) =>
          (keyRecipe(kn, era),
            rs.map(r => s"$dir/data/${r.file}").distinct.toArray)
        }.toArray
    (vs.foldLeft((from, Seq.empty[VersionedChangePartition])) {
      case ((prev, acc), v) =>
        val mA = manifestAt(prev)
        val mB = manifestAt(v)
        // prefix-compatible histories read fine: pairs predating a
        // later rename/add/widen surface under the CURRENT schema via
        // the era recipes (renames are append-only). What cannot be
        // read is a pair whose change list EXTENDS the baseline — a
        // schema evolution committed after the source was defined.
        require(mB.changes == changes0.take(mB.changes.size),
          s"schema evolution committed after stream definition " +
            s"(version $v carries ${mB.changes.size} changes, the " +
            s"baseline ${changes0.size}) — restart/redefine the source " +
            "to adopt the new schema")
        val aFiles = mA.entries.map(_._1).toSet
        val bFiles = mB.entries.map(_._1).toSet
        def parts(m: Versioned.Manifest, other: Set[String], side: String) =
          m.entries.filterNot(en => other(en._1)).map { case (f, _, era) =>
            VersionedChangePartition(s"$dir/data/$f", side, prev, v,
              recipeFor(era), dvFiltersFor(m, m.dvs, era))
          }
        // sidecar rows ADDED at this pair: the MOR deletes — emit the
        // deleted rows of each targeted live file as old-side events.
        // One small driver read resolves which files the new sidecars
        // target (they are deleted-keys-sized).
        val aDvs = mA.dvs.toSet
        val newDvs = mB.dvs.filterNot(aDvs)
        val dvParts =
          if (newDvs.isEmpty) Seq.empty
          else {
            val targets = spark.read
              .schema(Versioned.dataFileSchema(spark, dir,
                newDvs.head.file))
              .parquet(newDvs.map(r => s"$dir/data/${r.file}")
                .distinct: _*)
              .select("__target").distinct().collect()
              .map(_.getString(0)).toSet
            mB.entries.filter(e => targets(e._1)).map { case (f, _, era) =>
              VersionedChangePartition(s"$dir/data/$f", "old", prev, v,
                recipeFor(era), dvFiltersFor(mB, newDvs, era),
                dvOnly = true)
            }
          }
        (v, acc ++ parts(mA, bFiles, "old") ++ parts(mB, aFiles, "new")
          ++ dvParts)
    })._2.toArray
  }
}

/** One changed data file on one side of one version pair. `fields` is
  * the era recipe: (logical name, physical name or "", logical DDL).
  * `dvFilters`: per key column, its recipe under THIS file's era plus
  * the sidecar paths whose rows (targeting this file) are EXCLUDED
  * from the emission — the side's live-row semantics. `dvOnly` flips
  * the filter (q318): emit ONLY the rows those sidecars delete — the
  * old-side DELETE events of a MOR commit.
  */
final case class VersionedChangePartition(file: String, side: String,
    fromV: Long, toV: Long, fields: Array[(String, String, String)],
    dvFilters: Array[((String, String, String), Array[String])] = Array.empty,
    dvOnly: Boolean = false)
  extends InputPartition

final class VersionedChangeReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration,
    includeMeta: Boolean = true)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VersionedChangePartition]
    new PartitionReader[InternalRow] {
      import org.apache.parquet.example.data.Group
      import org.apache.parquet.hadoop.ParquetReader
      import org.apache.parquet.hadoop.example.GroupReadSupport

      private val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), new Path(p.file))
        .withConf(conf.value)
        .build()
      private val types =
        p.fields.map(f => DataType.fromDDL(f._3))
      // the side's MOR filter (q318): per key column, the deleted-key
      // set targeting THIS file — normal partitions SKIP those rows
      // (live-row semantics), dvOnly partitions emit ONLY them (the
      // delete events). Empty on dv-free lineages — zero cost.
      private val fileName = new Path(p.file).getName
      private val dvSets = p.dvFilters.map { case (recipe, paths) =>
        val dt = DataType.fromDDL(recipe._3)
        (recipe, dt, ParquetGroups.dvKeySet(conf.value, paths, fileName, dt))
      }
      private var cur: InternalRow = _

      private def inDv(g: Group): Boolean =
        dvSets.exists { case ((_, phys, _), dt, set) =>
          val v =
            if (phys.isEmpty || !g.getType.containsField(phys)) null
            else {
              val idx = g.getType.getFieldIndex(phys)
              if (g.getFieldRepetitionCount(idx) == 0) null
              else ParquetGroups.value(g, idx, dt)
            }
          v != null && set.contains(v)
        }

      // Group-API extraction under the LOGICAL type — the widen cast
      // happens in [[ParquetGroups.value]] (a file's int32 surfaces as
      // the stream's bigint), branching on the file's OWN primitive so
      // mixed-era histories decode without per-era reader code.
      override def next(): Boolean = {
        var g = reader.read()
        // dvOnly: keep exactly the deleted rows; otherwise skip them
        while (g != null && (if (p.dvOnly) !inDv(g)
          else dvSets.nonEmpty && inDv(g))) g = reader.read()
        if (g == null) { cur = null; false }
        else {
          val n = p.fields.length
          val arr = new Array[Any](n + (if (includeMeta) 3 else 0))
          var i = 0
          while (i < n) {
            val phys = p.fields(i)._2
            arr(i) =
              if (phys.isEmpty || !g.getType.containsField(phys)) null
              else {
                val idx = g.getType.getFieldIndex(phys)
                if (g.getFieldRepetitionCount(idx) == 0) null
                else ParquetGroups.value(g, idx, types(i))
              }
            i += 1
          }
          if (includeMeta) {
            arr(n) = UTF8String.fromString(p.side)
            arr(n + 1) = p.fromV
            arr(n + 2) = p.toV
          }
          cur = new GenericInternalRow(arr)
          true
        }
      }
      override def get(): InternalRow = cur
      override def close(): Unit = reader.close()
    }
  }
}

/** The VERSIONED TABLE as a STREAMING SINK — the write half of the
  * q280 source, completing the table's streaming story end-to-end
  * (`readStream.format("graft-versioned")` in,
  * `writeStream.format("graft-versioned")` out):
  *
  * {{{
  *   df.writeStream.format("graft-versioned")
  *     .option("path", dir)
  *     .option("checkpointLocation", ck)
  *     .start()
  * }}}
  *
  * Each micro-batch appends as ONE manifest commit through the OCC
  * ledger; executors stream `InternalRow`s straight into parquet under
  * `data/` ([[ParquetRowWriters]] — the q283 writer), so there is no
  * staging copy. EXACTLY-ONCE: the commit carries a
  * `#txn (queryId, epochId)` watermark checked INSIDE the OCC block
  * ([[Versioned.commitStreamingEpoch]]) — a replayed epoch (crash
  * between sink commit and checkpoint advance, the classic
  * at-least-once window foreachBatch sinks inherit) sees its own
  * watermark and appends NOTHING; its freshly-staged files are deleted
  * (a crash before that delete leaves unreferenced orphans for the
  * aged vacuum). A first commit to a never-committed dir CREATES the
  * table with the stream's schema (flat interchange types only);
  * appends to an existing table must match its logical schema
  * name-for-name and type-for-type, loudly.
  *
  * PARTITIONED BY tables (q308, `partitionSpec` non-empty): the epoch's
  * task files land as RAW STAGING, and the driver-side commit reads
  * them back through the partitioned writer
  * ([[Versioned.writeDataPartitioned]]) — the same clustering +
  * `#pfile` tagging every batch INSERT gets — before the tagged commit.
  * The epoch pays one extra read+write OF ITSELF (never of the table),
  * in exchange for the layout invariant the format's pruning rests on:
  * one file per partition value per commit, each tagged. The
  * alternative (per-task fanout writers, Iceberg's streaming shape)
  * avoids the rewrite but multiplies files by tasks × values per epoch
  * and loses the clustering — at epoch sizes (MBs, not the table) the
  * self-rewrite is the better trade, and it keeps ONE writer code
  * path for batch and stream. Exactly-once is unchanged: the `#txn`
  * watermark is pre-checked before the rewrite (a replayed epoch skips
  * the work) and authoritatively re-checked inside the OCC commit; a
  * crash between rewrite and commit leaves aged-vacuum orphans, like
  * every writer.
  */
final class VersionedStreamingWrite(dir: String, writeSchema: StructType,
    queryId: String,
    partitionSpec: Seq[Versioned.PartField] = Seq.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private def spark = SparkSession.active
  private val token = java.util.UUID.randomUUID.toString.take(8)

  // validate once, driver-side, at write construction
  Versioned.latestVersion(spark, dir) match {
    case Some(v) =>
      val cur = Versioned.readVersion(spark, dir, v).schema
      val have = cur.fields.map(f => f.name -> f.dataType.catalogString).toSet
      val got = writeSchema.fields.map(f => f.name -> f.dataType.catalogString).toSet
      require(got == have,
        s"graft-versioned sink: stream schema ${got.mkString(", ")} does not " +
          s"match table $dir schema ${have.mkString(", ")} — evolve the table " +
          "first (addColumn/renameColumn/widenColumn), the sink never " +
          "evolves it implicitly")
    case None =>
      writeSchema.fields.foreach { f =>
        require(VersionedStreamTable.Supported.exists(_.isInstance(f.dataType)),
          s"graft-versioned sink cannot create a table with column " +
            s"'${f.name}' of type ${f.dataType.catalogString} — the flat " +
            "interchange set is integral/fp/boolean/string/binary/date/timestamp")
      }
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new VersionedStreamWriterFactory(s"$dir/data", token,
      ParquetRowWriters.writeConf(spark, dir, writeSchema))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect {
      case m: ParquetFileCommit if m.rows > 0 => (m.name, m.rows)
    }.toSeq
    // a data-less epoch (zero-data batch, or every row filtered out)
    // commits nothing — replaying it appends nothing either, so the
    // watermark needn't advance for it
    if (added.isEmpty) ()
    else if (partitionSpec.isEmpty) {
      if (Versioned.commitStreamingEpoch(spark, dir, queryId, epochId, added)
        .isEmpty)
        // replayed epoch: the watermark already covers it — drop the
        // just-staged duplicates instead of committing them
        discard(messages)
    } else {
      // PARTITIONED epoch: cluster + tag the raw task files through the
      // partitioned writer, commit the CLUSTERED files, and drop the
      // raw staging either way (no manifest ever references it). The
      // watermark pre-check skips the rewrite on an obvious replay; the
      // OCC re-check stays authoritative against a zombie driver racing
      // live traffic.
      if (!Versioned.epochCommitted(spark, dir, queryId, epochId)) {
        val df = spark.read.schema(writeSchema)
          .parquet(added.map(a => s"$dir/data/${a._1}"): _*)
        val (entries, tags) =
          Versioned.writeDataPartitioned(df, dir, partitionSpec)
        if (Versioned.commitStreamingEpoch(spark, dir, queryId, epochId,
          entries, tags).isEmpty) {
          // lost the replay race inside the OCC block: the clustered
          // rewrite is a duplicate too
          val fs = new Path(dir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          entries.foreach { case (f, _) =>
            fs.delete(new Path(s"$dir/data/$f"), false)
          }
        }
      }
      discard(messages)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    discard(messages)

  private def discard(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.foreach {
      case m: ParquetFileCommit =>
        fs.delete(new Path(s"$dir/data/${m.name}"), false)
      case _ => ()
    }
  }
}

/** Ships to executors; one parquet writer per (epoch, partition, task
  * attempt) with an attempt-unique name.
  */
final case class VersionedStreamWriterFactory(dataDir: String, token: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    ParquetRowWriters.writer(dataDir,
      f"$token-e$epochId%05d-p$partitionId%05d-t$taskId.parquet", conf)
}
