package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{VectorAggregators, VectorOps}

/** The typed centroid Aggregator must agree with the exact relational
  * formulation (posexplode + per-dimension average) to floating-point
  * tolerance, across repartitionings (merge correctness).
  */
class CentroidSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("centroid aggregator matches the relational mean, any partitioning") {
    val centroid = udaf(new VectorAggregators.Centroid(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("e"))

    for (parts <- Seq(1, 7)) {
      val viaAgg = emb.repartition(parts)
        .groupBy("label").agg(centroid(col("e")).as("c"))
        .select(col("label"), posexplode(col("c")).as(Seq("dim", "v")))
        .as[(Int, Int, Double)].collect()
        .map { case (l, dim, v) => (l, dim) -> v }.toMap

      val viaSql = emb
        .select(col("label"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("label", "dim").agg(avg("v").as("v"))
        .as[(Int, Int, Double)].collect()
        .map { case (l, dim, v) => (l, dim) -> v }.toMap

      assert(viaAgg.keySet == viaSql.keySet)
      viaAgg.foreach { case (k, v) =>
        assert(math.abs(v - viaSql(k)) < 1e-9, s"dim $k differs at parts=$parts")
      }
    }
  }

  test("empty and singleton groups behave") {
    val centroid = udaf(new VectorAggregators.Centroid(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
    val one = Seq((1, Array(2.0, 4.0))).toDF("g", "e")
      .groupBy("g").agg(centroid(col("e")).as("c"))
      .select(col("c")).as[Array[Double]].head()
    assert(one.toSeq == Seq(2.0, 4.0))
  }
}
