package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Offers, OffersV2}

/** The `graft-offers` DataSourceV2: registry lookup by short name,
  * directory-pruning filter pushdown (visible as PushedFilters), column
  * pruning, and agreement with the typed flatMap source.
  */
class OffersV2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pplHtml =
    """<div data-test="default-offer">
      |  <a data-test="link-offer-title"> Junior   Data Engineer </a>
      |  <h3 data-test="text-company-name">ACME Sp. z o.o.</h3>
      |  <span data-test="offer-salary">11 000–12 000 zł brutto / mies.</span>
      |</div>
      |<div data-test="default-offer">
      |  <a data-test="link-offer-title">Backend Dev</a>
      |  <h3 data-test="text-company-name">Beta</h3>
      |</div>""".stripMargin

  private val jjitHtml =
    """<ul><li data-index="0">
      |  <h3>QA</h3>
      |  <h6><span>15 000</span><span>PLN/month</span></h6>
      |  <a><div><p>QualityHouse</p></div></a>
      |</li></ul>""".stripMargin

  /** A two-site, three-leaf snapshot lake on local disk. */
  private lazy val lake: String = {
    val base = java.nio.file.Files.createTempDirectory("graft-v2-lake")
    def put(leaf: String, content: String): Unit = {
      val dir = base.resolve(leaf)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("snap.html"), content)
    }
    put("site=pracujplit/region=waw/experience=senior", pplHtml)
    put("site=pracujplit/region=gd/experience=junior", pplHtml)
    put("site=justjoinit/region=waw/experience=junior", jjitHtml)
    base.toString
  }

  test("format lookup by short name reads all leaves with partition columns") {
    val rows = OffersV2.readRaw(spark, lake)
      .select("site", "region", "experience").distinct()
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("pracujplit", "waw", "senior"),
      ("pracujplit", "gd", "junior"),
      ("justjoinit", "waw", "junior")))
    assert(OffersV2.readRaw(spark, lake).count() == 5) // 2+2 ppl + 1 jjit
  }

  test("site/region equality filters push down and prune directories") {
    val df = OffersV2.readRaw(spark, lake)
      .filter(col("site") === "pracujplit" && col("region") === "waw")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(site,pracujplit)"),
      s"pushdown missing from plan:\n$plan")
    assert(df.count() == 2)
    // residual (non-partition) predicates stay in the plan, not the scan
    val residual = OffersV2.readRaw(spark, lake)
      .filter(col("site") === "pracujplit" && col("position_raw").contains("Backend"))
    assert(residual.count() == 2) // one per ppl leaf
    val rplan = residual.queryExecution.executedPlan.toString
    assert(!rplan.contains("PushedFilters: [EqualTo(site,pracujplit), "), rplan)
  }

  test("In-membership filters push down and prune to the named regions") {
    val df = OffersV2.readRaw(spark, lake)
      .filter(col("region").isin("gd", "nonexistent"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(region"), s"In pushdown missing:\n$plan")
    assert(df.count() == 2) // only the site=pracujplit/region=gd leaf
  }

  test("column pruning reaches the reader (ReadSchema in scan description)") {
    val df = OffersV2.readRaw(spark, lake).select("position_raw")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<position_raw:string>"), plan)
    // count(*) = empty required schema still yields one row per offer
    assert(OffersV2.readRaw(spark, lake).groupBy().count().as[Long].head() == 5L)
  }

  test("scan statistics report post-pushdown bytes (selected files only)") {
    def stats(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val all = stats(OffersV2.readRaw(spark, lake))
    val oneLeaf = stats(OffersV2.readRaw(spark, lake)
      .filter(col("site") === "justjoinit"))
    // unfiltered = 3 snapshot files; the site filter prunes to the one
    // jjit file, and the estimate must shrink with it — this is what
    // lets a filtered read auto-broadcast in a join
    assert(oneLeaf > 0 && oneLeaf < all, s"oneLeaf=$oneLeaf all=$all")
    assert(oneLeaf == BigInt(jjitHtml.getBytes("UTF-8").length))
  }

  test("normalized V2 offers agree with the typed flatMap source") {
    val viaV2 = OffersV2.offers(
      OffersV2.readRaw(spark, lake).filter(col("site") === "justjoinit"))
      .select("position", "company_name", "minimum", "maximum", "currency", "pay_period")
      .as[(String, String, String, String, String, String)].collect().toSeq
    val viaTyped = Offers.offers("justjoinit", Seq(jjitHtml).toDS())
      .as[(String, String, String, String, String, String)].collect().toSeq
    assert(viaV2 == viaTyped && viaV2.nonEmpty)
  }

  test("missing path and empty lake fail or return empty, not crash") {
    intercept[Exception] {
      spark.read.format("graft-offers").load()
    }
    val empty = java.nio.file.Files.createTempDirectory("graft-v2-empty").toString
    assert(OffersV2.readRaw(spark, empty).count() == 0)
    // stray non-partition dirs and hidden files are ignored
    val messy = java.nio.file.Files.createTempDirectory("graft-v2-messy")
    java.nio.file.Files.createDirectories(messy.resolve("not_a_partition"))
    java.nio.file.Files.createDirectories(
      messy.resolve("site=pracujplit/region=waw/experience=junior"))
    java.nio.file.Files.writeString(
      messy.resolve("site=pracujplit/region=waw/experience=junior/_SUCCESS"), "")
    assert(OffersV2.readRaw(spark, messy.toString).count() == 0)
  }

  test("micro-batch stream emits each landed snapshot once, with pushdown pruning") {
    // A fresh lake so this test owns the file-arrival sequence.
    val base = java.nio.file.Files.createTempDirectory("graft-v2-stream")
    def put(leaf: String, name: String, content: String): Unit = {
      val dir = base.resolve(leaf)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(name), content)
    }
    put("site=pracujplit/region=waw/experience=senior", "snap1.html", pplHtml)
    put("site=justjoinit/region=waw/experience=junior", "snap1.html", jjitHtml)

    val sink = s"offers_stream_${System.nanoTime()}"
    val q = OffersV2.readRawStream(spark, base.toString)
      .filter(col("site") === "pracujplit") // F1 pushdown prunes jjit leaves
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table(sink)
      assert(first.count() == 2) // the two ppl offers; jjit leaf pruned
      assert(first.filter(col("site") =!= "pracujplit").count() == 0)

      // A new scrape round lands in BOTH sites; only the subscribed
      // site's offers may arrive, exactly once, on the next trigger.
      put("site=pracujplit/region=waw/experience=senior", "snap2.html", pplHtml)
      put("site=justjoinit/region=waw/experience=junior", "snap2.html", jjitHtml)
      q.processAllAvailable()
      val second = spark.table(sink)
      assert(second.count() == 4)
      assert(second.filter(col("site") =!= "pracujplit").count() == 0)
      // first round's rows were not re-emitted: 2 old + 2 new positions
      assert(second.groupBy("position_raw").count()
        .filter(col("count") =!= 2).count() == 0)
    } finally q.stop()
  }

  test("maxFilesPerTrigger drains a snapshot backlog in bounded micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("graft-v2-throttle")
    val leaf = base.resolve("site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(leaf)
    (1 to 3).foreach(i =>
      java.nio.file.Files.writeString(leaf.resolve(s"snap$i.html"), pplHtml))

    val sink = s"offers_throttle_${System.nanoTime()}"
    val q = spark.readStream.format("graft-offers")
      .option("maxFilesPerTrigger", "1").load(base.toString)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() == 6) // 3 snapshots x 2 offers, all drained
      // each non-empty batch admitted exactly one file (2 offer rows)
      val batchRows = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
      assert(batchRows.length == 3 && batchRows.forall(_ == 2), batchRows)
    } finally q.stop()

    intercept[Exception] {
      spark.readStream.format("graft-offers")
        .option("maxFilesPerTrigger", "0").load(base.toString)
        .writeStream.format("memory").queryName(sink + "_bad")
        .outputMode("append").start().processAllAvailable()
    }
  }

  test("pushed limit caps per-snapshot parsing and shows in the plan") {
    val df = OffersV2.readRaw(spark, lake).limit(3)
    assert(df.collect().length == 3)
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(scan.description().contains("PushedLimit: 3"), scan.description())
  }

  test("runtime filtering prunes the lake walk from a joined dimension") {
    // the dim must be file-backed with a surviving Filter node — a local
    // Seq collapses to LocalRelation at optimization time and the
    // partition-pruning rule sees no selective predicate to derive from
    val dimPath = java.nio.file.Files.createTempDirectory("graft-v2-dim")
      .resolve("dim").toString
    Seq(("pracujplit", 1), ("justjoinit", 2)).toDF("site", "pri")
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("pri") === 1)
    val joined = OffersV2.readRaw(spark, lake).join(broadcast(dim), "site")
    assert(joined.collect().length == 4) // both ppl leaves, jjit pruned

    // descend through AQE wrappers: QueryStageExec hides its subtree
    // from children-based collect
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansIn(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansIn(s.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case other => other.children.flatMap(scansIn)
    }
    val scans = scansIn(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // the runtime IN(site) filter reached the walk: only the two
    // pracujplit snapshot files were planned, the jjit leaf was never read
    assert(scans.head.inputRDD.getNumPartitions == 2,
      s"expected 2 planned snapshot files, got ${scans.head.inputRDD.getNumPartitions}")
  }

  test("Trigger.AvailableNow catch-up drains bounded batches then terminates") {
    val base = java.nio.file.Files.createTempDirectory("graft-v2-catchup")
    val leaf = base.resolve("site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(leaf)
    (1 to 3).foreach(i =>
      java.nio.file.Files.writeString(leaf.resolve(s"snap$i.html"), pplHtml))
    val sink = s"offers_catchup_${System.nanoTime()}"
    val q = spark.readStream.format("graft-offers")
      .option("maxFilesPerTrigger", "1").load(base.toString)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(spark.table(sink).count() == 6)
  }

  test("COUNT(*) pushes down, grouped by partition columns, without materializing rows") {
    // counting kernel agrees with the parsers on the fixtures
    assert(Offers.countOffers("pracujplit", pplHtml) == 2)
    assert(Offers.countOffers("justjoinit", jjitHtml) == 1)
    // ...and count ≡ parser row count on every edge shape, including
    // markers at the very end (split drops trailing empty blocks)
    val marker = """<div data-test="default-offer""""
    Seq(pplHtml, pplHtml + marker, pplHtml + marker + ">", marker, marker + ">",
      "", "no offers here", marker + ">" + marker).foreach { doc =>
      assert(Offers.countOffers("pracujplit", doc) ==
        graft.sources.Offers.parsePracujDoc(doc).size,
        s"count/parse divergence on ${doc.take(60)}...")
    }

    val global = OffersV2.readRaw(spark, lake).groupBy().count()
    assert(global.as[Long].collect().toSeq == Seq(5L))
    val scan = global.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(scan.description().contains("PushedAggregation: [COUNT(*)]"),
      scan.description())
    // the scan's output is the narrow partial-agg schema, not offer rows
    assert(scan.readSchema().fieldNames.toSeq == Seq("count_1"))

    val bySite = OffersV2.readRaw(spark, lake).groupBy("site").count()
      .as[(String, Long)].collect().toMap
    assert(bySite == Map("pracujplit" -> 4L, "justjoinit" -> 1L))
    val grouped = OffersV2.readRaw(spark, lake).groupBy("site", "region").count()
    val gScan = grouped.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(gScan.readSchema().fieldNames.toSeq == Seq("site", "region", "count_1"))
    assert(grouped.as[(String, String, Long)].collect().toSet == Set(
      ("pracujplit", "waw", 2L), ("pracujplit", "gd", 2L), ("justjoinit", "waw", 1L)))

    // grouping by a NON-partition column must not push down (full rows flow)
    val byPos = OffersV2.readRaw(spark, lake).groupBy("position_raw").count()
    val pScan = byPos.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(!pScan.description().contains("PushedAggregation"))
    assert(byPos.collect().map(_.getLong(1)).sum == 5L)
  }

  test("batch read and drained stream agree on any lake shape (generated)") {
    val rnd = new scala.util.Random(4242)
    def pplSnap(n: Int): String = (1 to n).map(i =>
      s"""<div data-test="default-offer"><a data-test="link-offer-title">P${rnd.nextInt(1000)}_$i</a><h3 data-test="text-company-name">C$i</h3></div>""")
      .mkString("<html>", "\n", "</html>")
    def jjitSnap(n: Int): String = (1 to n).map(i =>
      s"""<li data-index="$i"><h3>J${rnd.nextInt(1000)}_$i</h3><h6><span>${1000 + i}</span><span>PLN/month</span></h6><a><div><p>K$i</p></div></a></li>""")
      .mkString("<ul>", "\n", "</ul>")

    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft-v2-prop$trial")
      for {
        site <- Seq("pracujplit", "justjoinit")
        region <- Seq("waw", "krk").take(1 + rnd.nextInt(2))
        exp <- Seq("junior", "senior").take(1 + rnd.nextInt(2))
      } {
        val leaf = base.resolve(s"site=$site/region=$region/experience=$exp")
        java.nio.file.Files.createDirectories(leaf)
        (1 to rnd.nextInt(3)).foreach { f =>
          val offers = rnd.nextInt(4) // 0-offer snapshots must round-trip too
          java.nio.file.Files.writeString(leaf.resolve(s"snap$f.html"),
            if (site == "pracujplit") pplSnap(offers) else jjitSnap(offers))
        }
      }
      def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.select(concat_ws("|", col("site"), col("region"), col("experience"),
          col("position_raw"))).as[String].collect().toSeq.sorted

      val batch = key(OffersV2.readRaw(spark, base.toString))
      // pushed-count kernel ≡ full parse on arbitrary snapshots
      assert(OffersV2.readRaw(spark, base.toString).count() == batch.size)
      val sink = s"offers_prop_${trial}_${System.nanoTime()}"
      val q = OffersV2.readRawStream(spark, base.toString)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(key(spark.table(sink)) == batch, s"trial $trial mismatch")
      } finally q.stop()
    }
  }

  test("checkpointed stream restart replays exact batches — no loss, no duplicates") {
    val root = java.nio.file.Files.createTempDirectory("graft-v2-restart")
    val leaf = root.resolve("lake/site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(leaf)
    def snap(tag: String): String =
      s"""<div data-test="default-offer"><a data-test="link-offer-title">$tag</a><h3 data-test="text-company-name">C</h3></div>"""
    // first era: files whose names later arrivals will sort BETWEEN
    java.nio.file.Files.writeString(leaf.resolve("b.html"), snap("from_b"))
    java.nio.file.Files.writeString(leaf.resolve("d.html"), snap("from_d"))

    val lakeDir = root.resolve("lake").toString
    val sinkDir = root.resolve("sink").toString
    val chkDir = root.resolve("chk").toString
    def runOnce(): Unit = {
      val q = OffersV2.readRawStream(spark, lakeDir)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // second era: a fresh stream instance must replay the logged
    // discovery order, then append the new files AFTER it — even
    // though a.html/c.html sort lexicographically before/between
    java.nio.file.Files.writeString(leaf.resolve("a.html"), snap("from_a"))
    java.nio.file.Files.writeString(leaf.resolve("c.html"), snap("from_c"))
    runOnce()

    val got = spark.read.parquet(sinkDir)
      .groupBy("position_raw").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("from_a" -> 1L, "from_b" -> 1L, "from_c" -> 1L, "from_d" -> 1L),
      s"restart broke exactly-once: $got")
  }

  test("runtime filters narrow the planned walk and never re-list the lake") {
    import graft.sources.v2._
    import org.apache.spark.sql.sources.EqualTo
    val base = java.nio.file.Files.createTempDirectory("graft-v2-rtf")
    def put(leaf: String, name: String, content: String): Unit = {
      val dir = base.resolve(leaf)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve(name), content)
    }
    put("site=pracujplit/region=waw/experience=senior", "snap.html", pplHtml)
    put("site=justjoinit/region=waw/experience=junior", "snap.html", jjitHtml)

    val scan = new OffersScan(base.toString, Array.empty, OffersTable.schema)
    val planned = scan.planInputPartitions()
    assert(planned.length == 2)

    // a snapshot lands AFTER planning; then a runtime (DPP) filter
    // arrives — the scan must keep a SUBSET of the original plan, not
    // re-list and pick up the new file (intra-query snapshot
    // consistency under concurrent lake appends)
    put("site=pracujplit/region=waw/experience=senior", "late.html", pplHtml)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("site", "pracujplit")))
    val narrowed = scan.planInputPartitions()
      .map(_.asInstanceOf[OffersInputPartition])
    assert(narrowed.length == 1)
    assert(narrowed.head.site == "pracujplit")
    assert(!narrowed.head.file.endsWith("late.html"),
      "runtime filtering admitted a file that landed after planning")

    // a FRESH scan (new query) does see the new file
    assert(new OffersScan(base.toString, Array.empty, OffersTable.schema)
      .planInputPartitions().length == 3)
  }

  test("discovery log compacts every N rounds and restart replays the identical order") {
    import graft.sources.v2._
    spark.version // the stream captures the active session's Hadoop conf
    val root = java.nio.file.Files.createTempDirectory("graft-v2-compact")
    val leaf = root.resolve("lake/site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(leaf)
    def snap(tag: String): String =
      s"""<div data-test="default-offer"><a data-test="link-offer-title">$tag</a><h3 data-test="text-company-name">C</h3></div>"""
    val lakeDir = root.resolve("lake").toString
    val chk = root.resolve("chk").toString
    def logNames: Set[String] = {
      val d = new java.io.File(s"$chk/graft-offers-files")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filterNot(_.startsWith(".")).toSet
    }
    def mkStream() = new OffersMicroBatchStream(
      lakeDir, Array.empty, OffersTable.schema, None, chk, logCompactInterval = 2)
    def order(s: OffersMicroBatchStream, n: Int): Seq[String] =
      s.planInputPartitions(OffersOffset(0), OffersOffset(n.toLong))
        .map(_.asInstanceOf[OffersInputPartition].file).toSeq

    // 5 discovery rounds with names that interleave lexicographically —
    // exactly the case a compacted log must preserve verbatim
    val s1 = mkStream()
    Seq("e", "c", "a", "d0", "b").foreach { n =>
      java.nio.file.Files.writeString(leaf.resolve(s"$n.html"), snap(s"from_$n"))
      s1.latestOffset()
    }
    val order1 = order(s1, 5)
    assert(order1.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("e.html", "c.html", "a.html", "d0.html", "b.html"))
    // rounds 0..3 collapsed into one snapshot; only the tail round remains
    assert(logNames == Set("3.compact", "4.round"), s"log files: $logNames")

    // restart: compacted snapshot + tail replay to the identical offsets
    val s2 = mkStream()
    assert(s2.reportLatestOffset().asInstanceOf[OffersOffset].index == 5L)
    assert(order(s2, 5) == order1, "restart changed the discovery order")

    // the restarted stream keeps compacting: two more rounds roll the
    // snapshot forward and tombstone everything it covers
    Seq("ab", "aa").foreach { n =>
      java.nio.file.Files.writeString(leaf.resolve(s"$n.html"), snap(s"from_$n"))
      s2.latestOffset()
    }
    assert(logNames == Set("5.compact", "6.round"), s"log files: $logNames")
    val s3 = mkStream()
    assert(s3.reportLatestOffset().asInstanceOf[OffersOffset].index == 7L)
    assert(order(s3, 7) == order(s2, 7), "second restart changed the order")
  }

  test("end-to-end restart with compaction enabled stays exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft-v2-compact-e2e")
    val leaf = root.resolve("lake/site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(leaf)
    def snap(tag: String): String =
      s"""<div data-test="default-offer"><a data-test="link-offer-title">$tag</a><h3 data-test="text-company-name">C</h3></div>"""
    val lakeDir = root.resolve("lake").toString
    val sinkDir = root.resolve("sink").toString
    val chkDir = root.resolve("chk").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-offers")
        .option("logCompactInterval", "1") // compact EVERY round
        .load(lakeDir)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", chkDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    val eras = Seq(Seq("b", "d"), Seq("a", "c"), Seq("ba", "bb"))
    eras.zipWithIndex.foreach { case (names, _) =>
      names.foreach(n =>
        java.nio.file.Files.writeString(leaf.resolve(s"$n.html"), snap(s"from_$n")))
      runOnce()
    }
    val got = spark.read.parquet(sinkDir)
      .groupBy("position_raw").count()
      .as[(String, Long)].collect().toMap
    val want = eras.flatten.map(n => s"from_$n" -> 1L).toMap
    assert(got == want, s"restart with compaction broke exactly-once: $got")
  }

  test("normalized offer stream matches the batch normalization on the same lake") {
    val sink = s"offers_norm_${System.nanoTime()}"
    val q = OffersV2.offersStream(spark, lake)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val cols = Seq("site", "position", "company_name", "minimum", "maximum",
        "currency", "pay_period")
      def key(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.select(concat_ws("|", cols.map(col): _*)).as[String].collect().toSeq.sorted
      assert(key(spark.table(sink)) ==
        key(OffersV2.offers(OffersV2.readRaw(spark, lake))))
    } finally q.stop()
  }

  test("custom task metrics report files read and offers emitted") {
    import graft.sources.v2._
    val scan = {
      val df = OffersV2.readRaw(spark, lake)
      df.queryExecution.sparkPlan.collectLeaves().collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.get
    }
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ==
      Set("snapshotFilesRead", "offersEmitted"))

    // drive one row reader directly over a known leaf
    val leafFile = java.nio.file.Paths
      .get(lake, "site=pracujplit/region=waw/experience=senior/snap.html")
    val reader = new OffersReaderFactory(OffersTable.schema.fieldNames)
      .createReader(OffersInputPartition(
        leafFile.toString, "pracujplit", "waw", "senior"))
    var n = 0
    while (reader.next()) n += 1
    assert(n == 2)
    val metrics = reader.currentMetricsValues().map(m => m.name() -> m.value()).toMap
    assert(metrics == Map("snapshotFilesRead" -> 1L, "offersEmitted" -> 2L))

    // and the counting reader reports the same totals without rows
    val countReader = new OffersCountReaderFactory(Seq("site"), 1)
      .createReader(OffersInputPartition(
        leafFile.toString, "pracujplit", "waw", "senior"))
    while (countReader.next()) {}
    val cMetrics = countReader.currentMetricsValues()
      .map(m => m.name() -> m.value()).toMap
    assert(cMetrics == Map("snapshotFilesRead" -> 1L, "offersEmitted" -> 2L))
  }

  test("q95 runs end-to-end on testdata") {
    val out = OffersV2.q95OffersSourceV2.run(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("site", "region", "experience", "position",
      "company_name", "minimum", "maximum", "currency", "pay_period"))
  }

  // ------------------------------------------------------------------
  // DSv2 WRITE path (S4 at the connector layer)
  // ------------------------------------------------------------------

  /** Raw rows covering both sites, missing fragments (null + empty),
    * entity-bearing text, and span lists of 0/1/2 elements.
    */
  private def rawRows = {
    val rows = Seq(
      ("pracujplit", "waw", "senior",
        "Data & ML Engineer <lead>", "A&B", "10 000–12 000 zł / mies.", null),
      ("pracujplit", "waw", "senior", "Backend Dev", "Beta", null, null),
      ("pracujplit", "gd", "junior", "QA", "", "9 000 zł", null),
      ("justjoinit", "waw", "junior", "SRE", "Gamma",
        null, Seq("15 000", "PLN/month")),
      ("justjoinit", "waw", "junior", "Dev", "Delta", null, Seq("20 000")),
      ("justjoinit", "kr", "mid", "Ops", "Eps", null, Seq.empty[String]))
    spark.createDataFrame(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6,
          Option(r._7).orNull)).asJava,
      graft.sources.v2.OffersTable.schema)
  }

  /** What the parser hands back for [[rawRows]]: innerText-normalized
    * (missing/empty fragments read as "", absent h6 reads as no spans).
    */
  private val rawRowsReadBack = Set(
    ("pracujplit", "waw", "senior",
      "Data & ML Engineer <lead>", "A&B", "10 000–12 000 zł / mies.", Nil),
    ("pracujplit", "waw", "senior", "Backend Dev", "Beta", "", Nil),
    ("pracujplit", "gd", "junior", "QA", "", "9 000 zł", Nil),
    ("justjoinit", "waw", "junior", "SRE", "Gamma", "", List("15 000", "PLN/month")),
    ("justjoinit", "waw", "junior", "Dev", "Delta", "", List("20 000")),
    ("justjoinit", "kr", "mid", "Ops", "Eps", "", Nil))

  private def collectRaw(dir: String) =
    OffersV2.readRaw(spark, dir)
      .select(col("site"), col("region"), col("experience"),
        coalesce(col("position_raw"), lit("")),
        coalesce(col("company_raw"), lit("")),
        coalesce(col("salary_raw"), lit("")),
        coalesce(col("spans"), array()))
      .as[(String, String, String, String, String, String, List[String])]
      .collect().toSeq

  test("write renders snapshots the read path parses back verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w1").toString
    OffersV2.writeRaw(rawRows, dir)
    assert(collectRaw(dir).toSet == rawRowsReadBack)
  }

  test("clustered write emits exactly one snapshot file per lake leaf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w2").toString
    // many input partitions, four leaves — the required distribution
    // must cluster each leaf into one task, hence one file per leaf
    OffersV2.writeRaw(rawRows.repartition(8), dir)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asScala.filter(p => p.toString.endsWith(".html")).toSeq
    assert(files.size == 4, s"expected one file per leaf, got: $files")
    assert(!files.exists(_.toString.contains("_staging")))
  }

  test("append accumulates snapshots; staging stays invisible to readers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w3").toString
    OffersV2.writeRaw(rawRows, dir)
    OffersV2.writeRaw(rawRows, dir)
    assert(OffersV2.readRaw(spark, dir).count() == 12) // two rounds of 6
    // a torn write's staged output must never be readable
    val staged = java.nio.file.Paths.get(dir,
      "_staging/qX/site=pracujplit/region=waw/experience=senior")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.writeString(staged.resolve("part-torn.html"), pplHtml)
    assert(OffersV2.readRaw(spark, dir).count() == 12)
  }

  test("write-after-read is the identity on a parsed lake") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w4").toString
    val orig = collectRaw(lake)
    OffersV2.writeRaw(OffersV2.readRaw(spark, lake), dir)
    val back = collectRaw(dir)
    assert(back.sortBy(_.toString) == orig.sortBy(_.toString))
  }

  test("overwrite mode is rejected — snapshot lakes are append-only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w5").toString
    intercept[Exception] {
      rawRows.write.format("graft-offers").mode("overwrite").save(dir)
    }
  }

  test("COUNT(*) pushdown agrees with rendered offer counts on a written lake") {
    val dir = java.nio.file.Files.createTempDirectory("graft-w6").toString
    OffersV2.writeRaw(rawRows, dir)
    val counted = OffersV2.readRaw(spark, dir).groupBy("site").count()
      .as[(String, Long)].collect().toMap
    assert(counted == Map("pracujplit" -> 3L, "justjoinit" -> 3L))
  }

  test("streaming sink replicates a lake continuously, exactly once across restarts") {
    val src = java.nio.file.Files.createTempDirectory("graft-ws-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-ws-dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ws-ck").toString
    OffersV2.writeRaw(rawRows, src)
    // round 1: drain the current lake into dst
    OffersV2.writeRawStream(OffersV2.readRawStream(spark, src), dst, ckpt)
      .awaitTermination()
    assert(collectRaw(dst).toSet == rawRowsReadBack)
    // new snapshots land in src; a restarted subscription ships ONLY them
    OffersV2.writeRaw(rawRows, src)
    OffersV2.writeRawStream(OffersV2.readRawStream(spark, src), dst, ckpt)
      .awaitTermination()
    val again = collectRaw(dst)
    assert(again.size == 12, s"expected exactly-once append, got ${again.size} rows")
    assert(again.toSet == rawRowsReadBack) // same multiset, doubled
    // and nothing staged or half-published is visible
    assert(!java.nio.file.Files.walk(java.nio.file.Paths.get(dst)).iterator().asScala
      .exists(p => p.toString.endsWith(".html") && p.toString.contains("_staging")))
  }

  test("vacuumSinkMeta bounds ledgers and staging; restart after vacuum stays exactly-once") {
    val src = java.nio.file.Files.createTempDirectory("graft-vs-src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-vs-dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vs-ck").toString
    OffersV2.writeRaw(rawRows, src)
    OffersV2.writeRawStream(OffersV2.readRawStream(spark, src), dst, ckpt)
      .awaitTermination()
    assert(collectRaw(dst).toSet == rawRowsReadBack)
    // plant a dead query's ledger and a crashed writer's staging orphan,
    // both older than the stale age
    val old = System.currentTimeMillis() - 120000L
    def plant(rel: String): java.io.File = {
      val f = new java.io.File(s"$dst/$rel")
      f.getParentFile.mkdirs()
      f.createNewFile()
      f
    }
    plant("_graft_commits/q-dead/5").setLastModified(old)
    new java.io.File(s"$dst/_graft_commits/q-dead").setLastModified(old)
    plant("_staging/q-dead/3/part.html")
    new java.io.File(s"$dst/_staging/q-dead").setLastModified(old)
    // vacuum: keepEpochs=0 even strips the LIVE query's markers — the
    // strongest case for the restart check below (a replay would have
    // to republish idempotently, never duplicate)
    val (markers, ledgers, staging) = graft.sources.v2.OffersStreamingWrite
      .vacuumSinkMeta(spark, dst, keepEpochs = 0, staleAgeMs = 60000L)
    assert(ledgers == 1, s"dead ledger removed: $ledgers")
    assert(staging == 1, s"staging orphan removed: $staging")
    assert(markers >= 1, s"live query's markers beyond keepEpochs dropped: $markers")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dst/_graft_commits/q-dead")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dst/_staging/q-dead")))
    // restart with new snapshots: the checkpoint resumes past the
    // committed offset and the lake stays exactly-once
    OffersV2.writeRaw(rawRows, src)
    OffersV2.writeRawStream(OffersV2.readRawStream(spark, src), dst, ckpt)
      .awaitTermination()
    val again = collectRaw(dst)
    assert(again.size == 12, s"exactly-once after vacuum, got ${again.size} rows")
    assert(again.toSet == rawRowsReadBack)
  }

  test("replayed and partially-published epochs publish exactly once (sink unit)") {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    spark.sparkContext // the write's ctor needs an ACTIVE session for its conf
    val base = java.nio.file.Files.createTempDirectory("graft-ws-unit").toString
    val tblSchema = graft.sources.v2.OffersTable.schema
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "q-unit"
      override def schema(): org.apache.spark.sql.types.StructType = tblSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap())
    }
    val sw = new graft.sources.v2.OffersStreamingWrite(base, info)
    val factory = sw.createStreamingWriterFactory(
      new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions(): Int = 1
      })
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(tblSchema)
    def stage(taskId: Long, epoch: Long) = {
      val w = factory.createWriter(0, taskId, epoch)
      rawRows.collect().foreach(r =>
        w.write(toCatalyst(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]))
      w.commit()
    }
    def lakeFiles() =
      java.nio.file.Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
        .filter(p => p.toString.endsWith(".html") &&
          !p.toString.contains("_staging")).map(_.toString).toSet
    sw.commit(0L, Array(stage(taskId = 1, epoch = 0L)))
    val published = lakeFiles()
    assert(published.size == 4) // one deterministic file per leaf
    assert(OffersV2.readRaw(spark, base).count() == 6)
    // full replay of a committed epoch (crash after marker): marker wins
    sw.commit(0L, Array(stage(taskId = 2, epoch = 0L)))
    assert(lakeFiles() == published)
    assert(OffersV2.readRaw(spark, base).count() == 6)
    // partial-publish crash window: marker missing but files on disk —
    // deterministic names + delete-then-rename republish idempotently
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/_graft_commits"), true)
    sw.commit(0L, Array(stage(taskId = 3, epoch = 0L)))
    assert(lakeFiles() == published)
    assert(OffersV2.readRaw(spark, base).count() == 6)
    // staging fully drained
    assert(!java.nio.file.Files.walk(java.nio.file.Paths.get(base)).iterator().asScala
      .exists(p => p.toFile.isFile && p.toString.contains("_staging")))
    // marker retention: committing epoch N drops the marker N-window back
    val retention = graft.sources.v2.OffersStreamingWrite.MarkerRetention
    sw.commit(retention, Array(stage(taskId = 4, epoch = retention)))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/_graft_commits/q-unit/0")),
      "expired epoch-0 marker must be dropped")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/_graft_commits/q-unit/$retention")))
  }
}
