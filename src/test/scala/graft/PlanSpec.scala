package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the optimizations the engine leans on
  * (pushdown, pruning, broadcast, top-k) must actually appear in the
  * executed plan, not just be hoped for.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q02 pushes both predicates into the parquet scan") {
    val p = planOf("q02_filter")
    assert(p.contains("PushedFilters"))
    assert(p.contains("EqualTo(event_type,signup)"))
    assert(p.contains("GreaterThan(value,100.0)"))
  }

  test("q01 prunes the read schema to the projected columns") {
    val p = planOf("q01_scan_project")
    assert(!p.contains("l_shipdate"), "unprojected column must not be read")
    assert(!p.contains("l_tax"))
  }

  test("q06 dictionary joins are broadcast, not shuffled") {
    val p = planOf("q06_dict_lookup")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q10 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q10_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q18 similarity probe uses the codegen'd native cosine") {
    val p = planOf("q18_similarity")
    assert(p.contains("graft_cosine"))
  }

  test("q22 sketches documents with zero pre-bucket shuffle") {
    val p = planOf("q22_minhash_lsh")
    assert(p.contains("graft_minhash16"))
    // exactly the LSH shuffles survive: widen repartition + (band,sig)
    // buckets + final pair count — no per-shingle or per-doc exchange.
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 4, s"expected <=4 exchanges, plan had $exchanges:\n$p")
  }

  test("q57 interval dim joins as broadcast nested loop (no shuffle)") {
    val p = planOf("q57_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("bucketed co-located join plans with no shuffle on either side") {
    import org.apache.spark.sql.functions._
    val s = spark
    val orders = s.read.parquet(s"$sfDir/orders.parquet")
    // bucketBy co-locates both tables on the join key at WRITE time —
    // the 100 TB answer to fact-fact joins that would otherwise shuffle
    // both sides on every query.
    orders.write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed_a")
    orders.groupBy("o_custkey").agg(sum("o_totalprice").as("tp"))
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed_b")
    // at sf0.001 both sides fit a broadcast, which would bypass the
    // bucketed path this spec exists to pin down — disable it here (at
    // real scale neither fact side is broadcastable)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = s.table("orders_bucketed_a").join(s.table("orders_bucketed_b"), "o_custkey")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle either side:\n$p")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    s.sql("DROP TABLE IF EXISTS orders_bucketed_a")
    s.sql("DROP TABLE IF EXISTS orders_bucketed_b")
  }

  test("dim-filtered join over the partitioned lake triggers dynamic partition pruning") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // a lake with several site= partitions, joined to a FILTERED dim on
    // the partition column: Spark must plan a dynamicpruning subquery in
    // the scan's PartitionFilters, so at run time only the dim's
    // surviving sites' directories are read. At 100 TB this is the
    // mechanism that turns a "join against this month's active sites"
    // query from a full-lake scan into a few-partition read.
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString + "/lake"
    val sites = Seq("jjit", "pracujplit", "nofluff", "solid")
    graft.sources.Lake.writeSnapshot(
      (1 to 400).map(i => (s"Pos$i", sites(i % 4))).toDF("position", "site")
        .withColumn("region", lit("waw"))
        .withColumn("experience", lit("mid"))
        .withColumn("snapshot_date", lit(java.sql.Date.valueOf("2026-08-13"))),
      base)
    // the dim must be a FILE scan: Spark only plans DPP when the
    // filtering side is scan-backed (a LocalRelation never triggers it)
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    Seq(("jjit", 1), ("nofluff", 2)).toDF("site_key", "prio")
      .write.parquet(dimPath)
    val dim = s.read.parquet(dimPath)
    val j = graft.sources.Lake.read(s, base)
      .join(dim.filter(col("prio") === 1), col("site") === col("site_key"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"partition-column join must plan a DPP subquery filter:\n$p")
    assert(j.select("position").count() == 100)
  }

  test("IVF partitioned serving prunes the probe to one centroid directory") {
    import org.apache.spark.sql.functions._
    val s = spark
    // q26's inverted file made physical: assignment written out
    // partitionBy(cid), so a probe is a static partition filter and only
    // its centroid's directory is ever scanned
    val v = graft.engine.Tables.widen(graft.engine.Tables.embeddings(s, sfDir))
      .select(col("vec_id"), graft.functions.VectorOps.toDouble(col("embedding")).as("e"))
    val c = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val assign = graft.operators.Similarity.assignCentroids(v, c)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    assign.write.partitionBy("cid").parquet(dir)
    val qcid = assign.filter(col("vec_id") === 0).select("cid").collect().head.getLong(0)
    val probe = s.read.parquet(dir)
      .filter(col("cid") === qcid && col("vec_id") =!= 0)
    val got = probe.count()
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cid") ||
      p.contains(s"PartitionFilters: [(cid"),
      s"probe must prune on the cid partition column:\n$p")
    // pruned read sees exactly the in-memory bucket
    assert(got == assign.filter(col("cid") === qcid && col("vec_id") =!= 0).count()
      && got > 0)
  }

  test("q254 self-joined aggregate computes scan+shuffle+agg ONCE (ReusedExchange)") {
    val df = graft.operators.Telemetry.q254YoyGrowth
      .run(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both join inputs are the identical aggregate subtree — the second
    // must arrive as a reused stage, not a second scan-and-shuffle
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      "TableCacheQueryStage|StageReuse".r.findFirstIn(p).isDefined,
      s"expected exchange/stage reuse in the self-join plan:\n$p")
  }
}
