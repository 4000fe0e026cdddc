package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{Incremental, Multimodal, Similarity}

/** Property guards for the diagnostics/kernels whose gate checks are
  * oracle-only: invariants the hash compare can't name.
  */
class DiagSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q221 Laplacian responds zero on flat images and nonzero on the seeded ones") {
    // the kernel's defining property: constant neighborhoods annihilate
    val flat = graft.operators.Png.decode(
      graft.operators.Png.encode(5, 4, 1, Array.fill(20)(7.toByte))).get
    def p(x: Int, y: Int) = flat.pixels(y * 5 + x) & 0xff
    for (y <- 1 until 3; x <- 1 until 4)
      assert(4 * p(x, y) - p(x - 1, y) - p(x + 1, y) - p(x, y - 1) - p(x, y + 1) === 0)
    val rows = Multimodal.q221ImageConv.run(spark, sfDir)
      .select("edge_count", "sum_abs_resp")
      .as[(Int, Long)].collect()
    assert(rows.exists(_._2 > 0), "seeded rasters produced no response at all")
    assert(rows.forall(r => r._2 >= r._1), "response mass below edge count — impossible")
  }

  test("q223 moments satisfy n*ssq >= sum^2 and spread bounds every value") {
    val rows = Similarity.q223EmbedDiag.run(spark, sfDir)
      .select("dim", "n", "sum_q", "ssq_q", "min_q", "max_q")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length === 64 && rows.map(_._1).toSeq === (1 to 64))
    rows.foreach { case (dim, n, sum, ssq, mn, mx) =>
      // Cauchy-Schwarz: n·Σq² ≥ (Σq)² — violated only by a broken fold
      assert(BigInt(n) * BigInt(ssq) >= BigInt(sum) * BigInt(sum), s"dim $dim moments inconsistent")
      assert(mn <= mx && sum >= n * mn && sum <= n * mx, s"dim $dim bounds inconsistent")
      // the quantization range contract: floor((x±1)·127) with |x| <= 1-ish
      assert(mn >= -128 && mx <= 300, s"dim $dim quantized outside sane range")
    }
  }

  test("q227 bitmap partials merge to the same exact answer under any partition of the data") {
    val ev = Tables.events(spark, sfDir)
    def viaPartials(unit: org.apache.spark.sql.Column): Map[String, Long] =
      ev.select(col("event_type"), unit.as("u"),
          expr("bitmap_bucket_number(user_id)").as("bucket"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("event_type", "u", "bucket")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy("event_type", "bucket")
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy("event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n"))
        .as[(String, Long)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    // day-grained and parity-grained partials both merge to the truth —
    // the partition of the log into ingestion units is invisible
    assert(viaPartials(date_trunc("day", col("ts"))) === exact)
    assert(viaPartials(col("event_id") % 2) === exact)
  }

  test("q225 reports the evolved column as absent-then-present with exact totals") {
    val rows = Incremental.q225SchemaDrift.run(spark, sfDir)
      .as[(Int, String, Long, Long)].collect().toSeq
    val orders = Tables.orders(spark, sfDir)
    val n1 = orders.filter(col("o_orderkey") % 2 === 0).count()
    val n2 = orders.filter(col("o_orderkey") % 2 === 1).count()
    assert(rows.toSet === Set(
      (1, "o_orderkey", n1, n1), (1, "o_totalprice", n1, n1),
      (1, "o_orderpriority", n1, 0L),
      (2, "o_orderkey", n2, n2), (2, "o_totalprice", n2, n2),
      (2, "o_orderpriority", n2, n2)))
  }
}
