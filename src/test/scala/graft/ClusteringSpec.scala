package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering

/** Connected-components guards: the star-contraction fallback on graph
  * shapes whose diameter outruns the propagation budget, and the
  * reliable-checkpoint path a cluster deployment would take.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A path graph 0-1-2-…-n: diameter n, the propagation worst case. */
  private def chain(n: Int) =
    (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("u", "v")

  test("star contraction labels a deep chain with its component minimum") {
    val labels = Clustering.starContraction(chain(40))
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 41 && labels.values.forall(_ == 0L))
  }

  test("exhausted propagation budget falls back to contraction") {
    // a chain of diameter 40 (far past what 2 pointer-doubling rounds
    // reach) plus a disjoint triangle — the fallback must label both
    val edges = chain(40)
      .union(Seq((100L, 101L), (101L, 102L), (100L, 102L)).toDF("u", "v"))
    val labels = Clustering.connectedComponents(edges, maxIter = 2)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 44)
    assert((0 to 40).forall(i => labels(i.toLong) == 0L))
    assert(Seq(100L, 101L, 102L).forall(labels(_) == 100L))
  }

  test("contraction agrees with converged propagation on a mixed graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 11L), (20L, 21L))
      .toDF("u", "v")
    val viaProp = Clustering.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val viaStar = Clustering.starContraction(edges)
      .as[(Long, Long)].collect().toMap
    assert(viaProp == viaStar)
  }

  test("contraction and propagation agree on a seeded random graph") {
    // 400 random edges over 300 nodes: a mix of large components, small
    // chains, and isolated pairs — both algorithms must produce the
    // identical labeling (min node id per component)
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)(
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (u, v) => u != v }
      .toDF("u", "v")
    val viaProp = Clustering.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val viaStar = Clustering.starContraction(edges)
      .as[(Long, Long)].collect().toMap
    assert(viaProp.nonEmpty && viaProp == viaStar)
  }

  test("reliable checkpoint path engages when a checkpoint dir is set") {
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      val labels = Clustering.connectedComponents(chain(10))
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 11 && labels.values.forall(_ == 0L))
      // the fixpoint actually wrote reliable state, not executor blocks
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally sc.setCheckpointDir(null)
  }

  test("q145 pagerank matches a plain-Scala fixed-point recompute from q22 pairs") {
    val sfDir = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val pairs = graft.operators.Dedup.q22MinhashLsh.run(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val nodes = graft.engine.Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().sorted
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var r: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (src, dsts) =>
        val c = r(src) / deg(src) // non-negative, so / == floor-div
        dsts.foreach(dst => inflow(dst) += c)
      }
      r = nodes.map(id => id -> (150000L + 85L * inflow(id) / 100L)).toMap
    }
    val expected = nodes.map(id => (id, deg.getOrElse(id, 0L), r(id))).toSeq
    val got = Clustering.q145DupPagerank.run(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // structure sanity: connected docs outrank the isolated base rank
    val isolated = got.filter(_._2 == 0L)
    assert(isolated.forall(_._3 == 150000L + 85L * 0L))
    assert(got.exists(_._2 > 0), "no edges at sf0.001 — dead test")
  }

  test("q198 triangles match a brute-force enumeration from q22 pairs") {
    val sfDir = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val pairs = graft.operators.Dedup.q22MinhashLsh.run(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edgeSet = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // brute force: all ordered node triples that pairwise share an edge
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edgeSet((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edgeSet((nodes(j), nodes(k))) && edgeSet((nodes(i), nodes(k)))
    } {
      triPerNode(nodes(i)) += 1; triPerNode(nodes(j)) += 1; triPerNode(nodes(k)) += 1
    }
    val expected = nodes.map { id =>
      val d = deg(id); val t = triPerNode(id)
      val cc = if (d >= 2) (2L * t).toDouble / (d * (d - 1)).toDouble else 0.0
      (id, d, t, cc)
    }.toSeq
    val got = Clustering.q198DupTriangles.run(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.exists(_._3 > 0), "no triangles at sf0.001 — dead test")
  }

  test("q108 never splits a dedup cluster across folds (no leakage)") {
    val sfDir = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val rows = Clustering.q108LeakageSafeSplit.run(spark, sfDir)
      .as[(Long, Long, String)].collect()
    // THE invariant the query exists for: one split per cluster
    val splitsPerCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    splitsPerCluster.foreach { case (cid, ss) =>
      assert(ss.size == 1, s"cluster $cid spans splits $ss")
    }
    // and it actually exercises multi-doc clusters (otherwise the test
    // proves nothing) with all three folds present
    assert(splitsPerCluster.values.nonEmpty &&
      rows.groupBy(_._2).exists(_._2.length > 1), "no multi-doc cluster at sf0.001")
    assert(rows.map(_._3).toSet == Set("train", "val", "test"))
    // singletons fall back to q100's own-id kernel: cluster_id == doc_id
    val members = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    members.filter(_._2.size == 1).foreach { case (cid, docs) =>
      assert(docs == Set(cid), s"singleton cluster $cid != its doc $docs")
    }
  }

  test("q239 k-core matches a plain-Scala fixpoint peel and converges within the oracle's 4 rounds") {
    val sfDir = "/root/testdata/sf0.001"
    graft.functions.GraftFunctions.register(spark)
    val pairs = graft.operators.Dedup.q22MinhashLsh.run(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    // reference: peel to fixpoint in plain Scala, counting rounds
    def degreesOf(es: Set[(Long, Long)]): Map[Long, Long] =
      (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var edges = pairs
    var alive = degreesOf(edges).filter(_._2 >= 2).keySet
    var roundsToFix = 0
    var changed = true
    while (changed) {
      val kept = edges.filter(e => alive(e._1) && alive(e._2))
      val nextAlive = degreesOf(kept).filter(_._2 >= 2).keySet
      changed = nextAlive != alive
      if (changed) roundsToFix += 1
      edges = kept
      alive = nextAlive
    }
    // the q239 oracle unrolls exactly 4 CTE rounds (a0 + 3 peels) — the
    // real data must reach its fixpoint within that budget or the oracle
    // and the engine's run-to-fixpoint would legitimately diverge
    assert(roundsToFix <= 3, s"k-core took $roundsToFix peels; oracle unrolls 3")

    val expected = {
      val degCore = degreesOf(edges.filter(e => alive(e._1) && alive(e._2)))
      val deg0 = degreesOf(pairs)
      alive.toSeq.sorted.map(id => (id, deg0(id), degCore(id)))
    }
    val got = Clustering.q239Kcore.run(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // every k-core survivor keeps >= k neighbors IN the core — the
    // defining property, asserted directly
    assert(got.forall(_._3 >= 2))
  }

  test("q248 perceptron trajectory matches a plain-Scala recompute and learns") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text", "lang", "n_chars").collect()
    val feats = docs.map { r =>
      val text = r.getString(0)
      val y = if (r.getString(1) == "en") 1L else -1L
      val toks = text.split(" ", -1).count(_.nonEmpty).toLong
      val digits = text.count(c => c >= '0' && c <= '9').toLong
      val the = ((text.length - text.replace(" the ", "").length) / 5).toLong
      (y, Array(1L, math.min(r.getLong(2) / 100, 50), math.min(toks / 10, 50),
        math.min(digits, 50), math.min(the, 50)))
    }
    var w = Array.fill(5)(0L)
    val expected = (1 to 3).map { e =>
      val wrong = feats.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0
      }
      val g = Array.tabulate(5)(i => wrong.map { case (y, x) => y * x(i) }.sum)
      w = w.zip(g).map { case (a, b) => a + b }
      (e.toLong, wrong.length.toLong, w(0), w(1), w(2), w(3), w(4))
    }
    val got = Clustering.q248Perceptron.run(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the classifier actually learns: last epoch misclassifies fewer
    // docs than the all-wrong start
    assert(got.last._2 < got.head._2)
  }
}
