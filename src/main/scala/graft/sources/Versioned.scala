package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED TABLE layer (time travel) — the "table format's commit
  * protocol" that [[Lake.upsertKeys]]'s doc names as the cure for its
  * swap-in-place model, realized Delta-style with Spark-native pieces:
  *
  *   - DATA FILES are immutable, written once under `dir/data/` with a
  *     commit-unique name prefix; a mutation never touches an existing
  *     file's bytes.
  *   - Each commit writes a MANIFEST `dir/_manifests/v<k>.manifest` — a
  *     text file listing exactly the live data files of version k (plus
  *     their row counts, so `history` answers without opening parquet).
  *     Reading version k is `spark.read.parquet(those files)`; readers
  *     of any version are never affected by in-flight writers because
  *     the files they were handed are immutable.
  *   - COW upsert/delete rewrite ONLY the files containing matched keys
  *     (the [[Lake.deleteKeys]] minimal-rewrite discipline) into NEW
  *     files; the next manifest points at rewritten + untouched + fresh
  *     appends. Untouched files are SHARED between manifests — an
  *     upsert's storage cost is the affected files, not the table.
  *   - Writers serialize through [[Lake.withCommit]]'s optimistic
  *     claim/commit ledger (atomic create-if-absent); the manifest
  *     rename itself is tmp-then-rename, so a crashed writer leaves at
  *     most orphaned data files (reclaimed by [[vacuum]]), never a
  *     half-visible version.
  *   - [[vacuum]] keeps the newest `keepVersions` manifests and deletes
  *     every data file unreachable from them — time travel's storage
  *     bound. Reading a vacuumed version fails loudly (missing files),
  *     the Delta contract.
  *
  * At 100 TB the manifest becomes the scaling concern (millions of
  * files): the format here is one line per file precisely so it can
  * shard into manifest-of-manifests without changing readers' contract;
  * the COW rewrite and the per-commit append both stay proportional to
  * the touched data.
  */
object Versioned {

  private val ManifestRe = """v(\d{9})\.manifest""".r

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_manifests")

  /** Committed versions, ascending (empty for a non-table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsOf(spark, dir)
    val md = manifestDir(dir)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.flatMap(_.getPath.getName match {
      case ManifestRe(k) => Some(k.toLong)
      case _ => None
    }).sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** (file, rows) entries of version `v`'s manifest. */
  private def manifestEntries(spark: SparkSession, dir: String,
      v: Long): Seq[(String, Long)] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(manifestDir(dir), f"v$v%09d.manifest")
    require(fs.exists(p), s"version $v does not exist under $dir")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.split("\n").filter(_.nonEmpty).toSeq.map { line =>
      val Array(f, n) = line.split("\t")
      (f, n.toLong)
    }
  }

  /** Time-travel read: the exact row set committed as version `v`. */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val files = manifestEntries(spark, dir, v).map(_._1)
    if (files.isEmpty)
      // an empty version still has a schema-less shape; surface it as an
      // explicit empty frame rather than a parquet read of nothing
      throw new IllegalStateException(s"version $v of $dir lists no files")
    spark.read.parquet(files.map(f => s"$dir/data/$f"): _*)
  }

  /** The latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(s"$dir is not a versioned table")))

  /** (version, nFiles, nRows) per committed version, ascending. */
  def history(spark: SparkSession, dir: String): Seq[(Long, Int, Long)] =
    versions(spark, dir).map { v =>
      val es = manifestEntries(spark, dir, v)
      (v, es.size, es.map(_._2).sum)
    }

  /** Write `df` as immutable data files; returns (file, rows) entries.
    * Files land under `dir/data/` named `<token>-part-*.parquet` — the
    * commit-unique token keeps concurrent writers' files disjoint.
    */
  private def writeData(df: DataFrame, dir: String): Seq[(String, Long)] = {
    val spark = df.sparkSession
    val fs = fsOf(spark, dir)
    val token = java.util.UUID.randomUUID.toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir, s"_staging-$token")
    df.write.mode("overwrite").parquet(tmp.toString)
    val dataDir = new org.apache.hadoop.fs.Path(dir, "data")
    fs.mkdirs(dataDir)
    val entries = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val name = s"$token-${s.getPath.getName}"
        require(fs.rename(s.getPath, new org.apache.hadoop.fs.Path(dataDir, name)),
          s"staging rename failed for ${s.getPath}")
        name
      }
    fs.delete(tmp, true)
    // per-file row counts from parquet FOOTERS — a driver-side metadata
    // read (ParquetFileReader.getRecordCount), not a Spark job per file:
    // with one commit per streaming micro-batch (q219) the per-file job
    // launch dominated the whole upsert
    val conf = spark.sparkContext.hadoopConfiguration
    entries.map { name =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(dataDir, name), conf))
      try (name, reader.getRecordCount) finally reader.close()
    }
  }

  /** Atomically commit `files` as the next version; returns it. Runs
    * inside [[Lake.withCommit]], so concurrent committers retry with
    * the winner's version visible (their `build` is re-evaluated).
    */
  private def commitManifest(spark: SparkSession, dir: String)(
      build: Seq[(String, Long)] => Seq[(String, Long)]): Long =
    Lake.withCommit(spark, dir) {
      val fs = fsOf(spark, dir)
      val prev = latestVersion(spark, dir)
      val base = prev.map(manifestEntries(spark, dir, _)).getOrElse(Seq.empty)
      val next = prev.getOrElse(0L) + 1
      val entries = build(base)
      val md = manifestDir(dir)
      fs.mkdirs(md)
      val tmp = new org.apache.hadoop.fs.Path(md, f"v$next%09d.tmp")
      val out = fs.create(tmp, true)
      try out.write(entries.map { case (f, n) => s"$f\t$n" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      require(fs.rename(tmp, new org.apache.hadoop.fs.Path(md, f"v$next%09d.manifest")),
        s"manifest rename failed for v$next")
      next
    }

  /** Create (or fully replace) the table: version = all of `df`. */
  def create(df: DataFrame, dir: String): Long = {
    val entries = writeData(df, dir)
    commitManifest(df.sparkSession, dir)(_ => entries)
  }

  /** Append-only commit: previous files plus `df`'s new ones. */
  def append(df: DataFrame, dir: String): Long = {
    val entries = writeData(df, dir)
    commitManifest(df.sparkSession, dir)(base => base ++ entries)
  }

  /** COW MERGE commit: same-key rows replaced, `deleteFlag` rows
    * removed, new keys appended — only files CONTAINING a matched key
    * are rewritten (new files), everything else is carried by
    * reference. `changes` must hold at most one row per key
    * ([[Lake.upsertKeys]]'s contract, same reason).
    */
  def upsert(spark: SparkSession, dir: String, keyCol: String,
      changes: DataFrame, deleteFlag: Option[String] = None): Long = {
    changes.persist()
    try commitManifest(spark, dir) { base =>
      val keys = changes.select(keyCol).distinct()
      val touched: Set[String] =
        if (base.isEmpty) Set.empty
        else read(spark, dir)
          .select(col(keyCol), input_file_name().as("_f"))
          .join(broadcast(keys), keyCol)
          .select("_f").distinct().collect()
          .map(r => new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).getName).toSet
      val survivors = deleteFlag.fold(changes)(Lake.notDeleted(changes, _))
      val rewritten =
        if (touched.isEmpty) writeData(survivors, dir)
        else {
          val old = spark.read.parquet(
            touched.toSeq.map(f => s"$dir/data/$f"): _*)
            .join(broadcast(keys), Seq(keyCol), "left_anti")
          writeData(old.unionByName(survivors.select(old.columns.map(col): _*)), dir)
        }
      base.filterNot { case (f, _) => touched(f) } ++ rewritten
    } finally changes.unpersist()
  }

  /** Delete by key — COW like [[upsert]], rewriting only affected files. */
  def deleteKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: DataFrame): Long =
    commitManifest(spark, dir) { base =>
      val k = keys.select(keyCol).distinct()
      val touched: Set[String] =
        if (base.isEmpty) Set.empty
        else read(spark, dir)
          .select(col(keyCol), input_file_name().as("_f"))
          .join(broadcast(k), keyCol)
          .select("_f").distinct().collect()
          .map(r => new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).getName).toSet
      val rewritten =
        if (touched.isEmpty) Seq.empty
        else writeData(
          spark.read.parquet(touched.toSeq.map(f => s"$dir/data/$f"): _*)
            .join(broadcast(k), Seq(keyCol), "left_anti"), dir)
      base.filterNot { case (f, _) => touched(f) } ++ rewritten
    }

  /** RIGHT-TO-BE-FORGOTTEN purge: remove `keys` from EVERY version —
    * the one operation that may rewrite HISTORY, because erasure law
    * outranks the immutability contract (time travel must stop
    * resurrecting the data subject). Each data file containing a
    * matched key is rewritten ONCE (1:1, coalesced) and every manifest
    * that referenced it is repointed in place — version NUMBERS and all
    * untouched files survive, so audit lineage and file sharing are
    * preserved; emptied files drop out of their manifests; the old
    * bytes are deleted last. Runs inside the OCC ledger like any
    * writer. Manifest replacement is delete+rename with the content
    * already safely in the tmp file — a crash between the two leaves a
    * missing manifest whose `.tmp` sibling holds the full content
    * (recoverable, never silent loss; the rename goes through the
    * Hadoop FS so the local ChecksumFileSystem's .crc sidecars stay
    * consistent). Returns (filesRewritten, versionsTouched).
    */
  def purgeKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: DataFrame): (Int, Int) =
    Lake.withCommit(spark, dir) {
      val fs = fsOf(spark, dir)
      val vs = versions(spark, dir)
      val manifests = vs.map(v => v -> manifestEntries(spark, dir, v)).toMap
      val allFiles = manifests.values.flatten.map(_._1).toSet.toSeq
      val k = keys.select(keyCol).distinct()
      val hit: Set[String] =
        if (allFiles.isEmpty) Set.empty
        else spark.read.parquet(allFiles.map(f => s"$dir/data/$f"): _*)
          .select(col(keyCol), input_file_name().as("_f"))
          .join(broadcast(k), keyCol)
          .select("_f").distinct().collect()
          .map(r => new org.apache.hadoop.fs.Path(
            new java.net.URI(r.getString(0))).getName).toSet
      // rewrite each hit file once; empty results drop from manifests
      val replacement: Map[String, Seq[(String, Long)]] = hit.map { f =>
        val cleaned = spark.read.parquet(s"$dir/data/$f")
          .join(broadcast(k), Seq(keyCol), "left_anti").coalesce(1)
        f -> writeData(cleaned, dir).filter(_._2 > 0)
      }.toMap
      var touched = 0
      vs.foreach { v =>
        val entries = manifests(v)
        if (entries.exists(e => hit(e._1))) {
          touched += 1
          val updated = entries.flatMap { case (f, n) =>
            if (hit(f)) replacement(f) else Seq((f, n))
          }
          val md = manifestDir(dir)
          val tmp = new org.apache.hadoop.fs.Path(md, f"v$v%09d.tmp")
          val out = fs.create(tmp, true)
          try out.write(updated.map { case (f, n) => s"$f\t$n" }
            .mkString("\n").getBytes("UTF-8"))
          finally out.close()
          val target = new org.apache.hadoop.fs.Path(md, f"v$v%09d.manifest")
          // through the Hadoop FS on every scheme — a java.nio move
          // would strand the local ChecksumFileSystem's .crc sidecar
          // and poison the next manifest read
          fs.delete(target, false)
          require(fs.rename(tmp, target), s"manifest replace failed for v$v")
        }
      }
      // the purged bytes leave the disk only after no manifest points at them
      hit.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, s"data/$f"), false))
      (hit.size, touched)
    }

  /** OPTIMIZE: rewrite the current version's data into `nFiles` compact
    * files and commit the result as a new, logically-identical version
    * (append/upsert accretion leaves a long-lived table as thousands of
    * small files; this is the Delta OPTIMIZE analog). Old versions keep
    * reading their original small files — compaction is just another
    * commit, so time travel, concurrency, and [[vacuum]] all apply to
    * it unchanged.
    */
  def optimize(spark: SparkSession, dir: String, nFiles: Int): Long =
    // the rewrite happens INSIDE the commit's build, against the slot's
    // own base — computing it outside would let a concurrent committer
    // land between read and claim and have its change silently compacted
    // away (lost update)
    commitManifest(spark, dir) { base =>
      require(base.nonEmpty, s"optimize: $dir has no current version")
      writeData(
        spark.read.parquet(base.map(e => s"$dir/data/${e._1}"): _*)
          .repartition(nFiles), dir)
    }

  /** FILE SKIPPING by parquet footer statistics (the Iceberg/Delta
    * data-skipping read path, on real metadata): for a range predicate
    * on `column`, read each manifest file's FOOTER (parquet-hadoop
    * `ParquetFileReader` — row-group column statistics, never data
    * pages), keep only files whose [min, max] envelope overlaps
    * [lo, hi], and scan just those. Soundness is the parquet stats
    * contract (a value outside every row group's envelope cannot exist
    * in the file); effectiveness is the layout's job — a range-sorted
    * or z-ordered write gives tight per-file envelopes, an unsorted one
    * degenerates to reading everything (never to wrong answers).
    * Returns the pruned DataFrame with the residual predicate applied.
    *
    * At 100 TB the footer walk itself becomes a job (millions of
    * files): the same loop runs as a parallelized metadata scan, or the
    * envelopes are lifted into the manifest at commit time — the read
    * contract here (list → envelope-filter → scan survivors) is
    * unchanged either way.
    */
  def readRangeSkipping(spark: SparkSession, dir: String, v: Long,
      column: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = manifestEntries(spark, dir, v).map(_._1)
    val kept = files.filter { name =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/data/$name")
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val md = reader.getFooter.getBlocks
        val idx = reader.getFooter.getFileMetaData.getSchema
          .getFieldIndex(column)
        // overlap iff SOME row group's envelope intersects [lo, hi];
        // a missing/empty stats object fails open (file kept) — stats
        // are an optimization, never a correctness gate
        (0 until md.size).exists { b =>
          val st = md.get(b).getColumns.get(idx).getStatistics
          if (st == null || st.isEmpty) true
          else {
            val mn = st.genericGetMin.asInstanceOf[Number].longValue
            val mx = st.genericGetMax.asInstanceOf[Number].longValue
            mx >= lo && mn <= hi
          }
        }
      } finally reader.close()
    }
    val df =
      if (kept.isEmpty)
        readVersion(spark, dir, v).filter(col(column).between(lo, hi)).limit(0)
      else spark.read.parquet(kept.map(f => s"$dir/data/$f"): _*)
        .filter(col(column).between(lo, hi))
    (df, kept.size, files.size)
  }

  /** Retention: keep the newest `keepVersions` manifests, delete older
    * manifests and every data file only they referenced (plus crashed
    * writers' orphans — files no kept manifest lists). Returns
    * (manifestsRemoved, dataFilesRemoved).
    */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int): (Int, Int) = {
    val fs = fsOf(spark, dir)
    val vs = versions(spark, dir)
    val dropped = vs.dropRight(keepVersions)
    val kept = vs.takeRight(keepVersions)
    val live: Set[String] =
      kept.flatMap(manifestEntries(spark, dir, _).map(_._1)).toSet
    dropped.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        manifestDir(dir), f"v$v%09d.manifest"), false)
    }
    val dataDir = new org.apache.hadoop.fs.Path(dir, "data")
    val dead =
      if (!fs.exists(dataDir)) Seq.empty
      else fs.listStatus(dataDir).toSeq.filter(s => !live(s.getPath.getName))
    dead.foreach(s => fs.delete(s.getPath, false))
    (dropped.size, dead.size)
  }
}
