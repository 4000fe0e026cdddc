package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, VectorOps}

/** The native expression must agree bit-for-bit with the HOF formulation
  * (same left-to-right accumulation), and be callable from SQL.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
    (Array(0.5, -0.25, 8.125), Array(-1.5, 0.75, 2.0)),
    (Array(1e-8, 1e8, -1.0), Array(1e8, 1e-8, 1.0)))
    .toDF("a", "b")

  test("native cosine is bit-identical to the HOF composition") {
    GraftFunctions.register(spark)
    val rows = vecs.select(
      GraftFunctions.cosine(col("a"), col("b")).as("native"),
      VectorOps.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("native cosine is SQL-callable after registration") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_t")
    val r = spark.sql("SELECT graft_cosine(a, b) FROM vecs_t").as[Double].collect()
    assert(r.length == 3 && r.forall(v => !v.isNaN))
  }

  test("two native cosine calls in one projection (codegen scope sharing)") {
    GraftFunctions.register(spark)
    val rows = vecs.select(
      GraftFunctions.cosine(col("a"), col("b")).as("c1"),
      GraftFunctions.cosine(col("b"), col("a")).as("c2"))
      .as[(Double, Double)].collect()
    rows.foreach { case (x, y) => assert(x == y) }
  }

  test("known value: parallel vectors have cosine 1") {
    GraftFunctions.register(spark)
    val r = Seq((Array(2.0, 4.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(GraftFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("q90 RP-LSH: every emitted pair is a true positive; recall has a floor") {
    val d = "/root/testdata/sf0.001"
    val lsh = graft.operators.Similarity.q90RpLshNearDup.run(spark, d)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // exact ground truth by brute force on the same data
    val emb = graft.engine.Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("e"))
    val a = emb.select(col("vec_id").as("va"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("e").as("eb"))
    val exact = a.join(org.apache.spark.sql.functions.broadcast(b), col("va") < col("vb"))
      .filter(VectorOps.cosine(col("ea"), col("eb")) > 0.3)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    // precision 1.0: LSH candidates are verified with the exact cosine,
    // so no emitted pair may fall outside the exact > 0.3 set
    assert(lsh.subsetOf(exact),
      s"false positives: ${(lsh -- exact).take(5)}")
    // recall floor: 16-bit/4-band signatures on this fixed data find
    // 424/920 of the (all-far, sim 0.3-0.6) exact pairs — deterministic,
    // so a drop below 0.4 means the signature or banding broke
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("native rpsig16 is bit-identical to the relational HOF signature") {
    import graft.operators.Similarity
    val s = SparkTestSession.spark
    import s.implicits._
    GraftFunctions.register(s)
    val v = graft.engine.Tables.embeddings(s, "/root/testdata/sf0.01")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("e"))
    // same IEEE fold order -> same sign decisions -> same buckets; any
    // divergence silently changes LSH recall, so this is exact, not ~=
    val native = Similarity.rpSignatures(v)
      .select("vec_id", "band", "bval").as[(Long, Int, Int)].collect().toSet
    val relational = Similarity.rpSignaturesRelational(v)
      .select("vec_id", "band", "bval").as[(Long, Int, Int)].collect().toSet
    assert(native === relational)
    assert(native.size === 500 * 4)
  }

  test("q125 probe against a persisted bucketed vector index matches the derived form") {
    import graft.operators.Similarity
    val s = SparkTestSession.spark
    import s.implicits._
    GraftFunctions.register(s)
    val d = "/root/testdata/sf0.001"
    val v = graft.engine.Tables.embeddings(s, d)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("e"))
    val expected = Similarity.q125VecProbe.run(s, d)
      .as[(Long, Option[Long], Long, Option[Double])].collect().toSet
    // production path: the vector index is PERSISTED parquet bucketed on
    // the (band, bval) join key — the probe must read it bucket-aligned
    // (batch-side shuffle only) and produce the derived-both-sides answer
    Similarity.rpSignatures(v.filter(col("vec_id") % 10 =!= 0))
      .write.mode("overwrite").bucketBy(8, "band", "bval")
      .saveAsTable("vec_index")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Similarity.probeVecNeardupIndex(
        Similarity.rpSignatures(v.filter(col("vec_id") % 10 === 0)),
        s.table("vec_index"), 0.3)
      val got = probe.as[(Long, Option[Long], Long, Option[Double])].collect().toSet
      assert(got === expected)
      val p = probe.queryExecution.executedPlan.toString
      val bandShuffles = "Exchange hashpartitioning\\(band".r.findAllIn(p).length
      assert(bandShuffles <= 1,
        s"index side must read bucket-aligned (batch-side shuffle only):\n$p")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS vec_index")
    }
  }

  test("recallAtK: identity scores 1.0; a known perturbation scores (k-1)/k") {
    import graft.operators.Similarity
    val s = SparkTestSession.spark
    import s.implicits._
    val exact = Similarity.q112AnnBatch.run(s, "/root/testdata/sf0.001")
      .select("qid", "vec_id", "rn")
    // identity: an approximate index that returns the truth scores 1.0
    val self = Similarity.recallAtK(exact, exact, 10)
      .as[(Long, Double)].collect().toMap
    assert(self.size == 8 && self.values.forall(_ == 1.0))
    // perturb query 0's rank-1 neighbor to a vec_id outside its top-10:
    // exactly one miss → recall 0.9 for q0, 1.0 elsewhere
    val rows = exact.as[(Long, Long, Int)].collect()
    val perturbed = rows.map {
      case (0L, _, 1) => (0L, -1L, 1)
      case r => r
    }.toSeq.toDF("qid", "vec_id", "rn")
    val r = Similarity.recallAtK(perturbed, exact, 10)
      .as[(Long, Double)].collect().toMap
    assert(r(0L) == 0.9 && r.filterNot(_._1 == 0L).values.forall(_ == 1.0))
  }

  test("q182's multi-probe ANN arm holds recall@20 against the exact arm") {
    import graft.operators.Similarity
    val s = SparkTestSession.spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("doc_id").as("vec_id"), col("rv").as("rn"))
    val recall = Similarity.recallAtK(
      shape(Similarity.vectorArmAnn(s, d, 20)),
      shape(Similarity.vectorArmExact(s, d, 20)), 20)
      .as[(Long, Double)].collect()
    assert(recall.length == 5, s"5 query vectors at sf0.01: ${recall.length}")
    val avg = recall.map(_._2).sum / recall.length
    val min = recall.map(_._2).min
    // the synthetic corpus is near-random vectors — LSH's worst case —
    // and multi-probe still holds these floors; clustered real
    // embeddings separate far better. A drop below them means the
    // banding or probe expansion broke, not that the data got harder.
    assert(avg >= 0.80, s"avg recall@20 $avg (per-query: ${recall.toSeq})")
    assert(min >= 0.60, s"min recall@20 $min (per-query: ${recall.toSeq})")
  }
}
