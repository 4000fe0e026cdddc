package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.QueryDef
import graft.operators.{Advanced, Analytics, BloomJoin, Clustering, Corpus, Dedup, Incremental, Layout, Multimodal, Pipeline, Quality, Relational, Similarity, Skew, Sql, Sql4, StreamQueries, Telemetry, TextAnalysis, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Runtime session tuning applied before every query: AQE for runtime
    * re-planning (skew joins, partition coalescing at scale) and µs parquet
    * timestamps so results written by Verify carry the same physical type
    * DuckDB produces for the oracle side.
    */
  private val tuned =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  private def tune(spark: SparkSession): SparkSession = {
    // Once per session: repeated conf.set / function re-registration
    // invalidates session-level caches (file listings, parquet footers)
    // and costs seconds per query.
    if (tuned.add(spark)) {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // Storage-partitioned execution defaults (q236): honor a DSv2
      // scan's reported KeyGroupedPartitioning (the graft-offers source
      // reports its lake-leaf clustering only under option("spj", true),
      // so nothing changes for scans that don't opt in), and let a
      // partitioning on a SUBSET of the join keys count as co-partitioned
      // (leaf keys ⊂ leaf+offer join keys) — without it Spark demands the
      // exact key set and reshuffles both sides anyway.
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      graft.functions.GraftFunctions.register(spark)
    }
    spark
  }

  /** All verifiable engine queries, one per operator in SURVEY.md §2. */
  def queryDefs: Seq[QueryDef] =
    Relational.all ++ TextQueries.all ++ Similarity.all ++ Dedup.all ++
      TextAnalysis.all ++ Multimodal.all ++ Advanced.all ++ Skew.all ++
      Analytics.all ++ Clustering.all ++ Sql.all ++ Sql4.all ++ BloomJoin.all ++
      Telemetry.all ++ Incremental.all ++ Corpus.all ++ Quality.all ++
      Pipeline.all ++ graft.plans.AsOf.all ++ graft.sources.OffersV2.all ++
      StreamQueries.all ++ Layout.all ++ graft.sources.Avro.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q12GroupbyAgg.run(tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryDefs.map(q => q.name ->
      ((s: SparkSession, d: String) => q.run(tune(s), d))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
