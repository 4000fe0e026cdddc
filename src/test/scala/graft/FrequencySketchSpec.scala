package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrequencySketch

/** Misra-Gries guarantees under adversarial skew — the properties the
  * q98 two-pass construction leans on, exercised where the (uniform)
  * testdata cannot: heavy items must survive decrements and cross-
  * partition merges, and estimates must underestimate by at most
  * n/(k+1).
  */
class FrequencySketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("heavy items survive skew and partition merges within the error bound") {
    val rnd = new scala.util.Random(11)
    val items = rnd.shuffle(
      Seq.fill(4000)("hot1") ++ Seq.fill(2500)("hot2") ++
        Seq.fill(5500)(s"t${rnd.nextInt(2000)}"))
    val n = items.size
    val k = 20
    val mg = udaf(new FrequencySketch.MisraGries(k), Encoders.STRING)
    val out = items.toDF("tok")
      .repartition(8) // force 8 partial sketches through the merge path
      .agg(mg(col("tok")).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select("c.token", "c.n").as[(String, Long)].collect().toMap
    assert(out.size <= k)
    // no false negatives above n/(k+1)
    assert(out.contains("hot1") && out.contains("hot2"), s"lost a heavy item: $out")
    // estimates underestimate, by at most n/(k+1)
    val bound = n / (k + 1)
    assert(out("hot1") <= 4000L && 4000L - out("hot1") <= bound, out("hot1").toString)
    assert(out("hot2") <= 2500L && 2500L - out("hot2") <= bound, out("hot2").toString)
  }

  test("q98 two-pass result equals the exact full groupBy") {
    val sfDir = "/root/testdata/sf0.001"
    val viaSketch = graft.operators.Corpus.q98HeavyHitters.run(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val t = split(col("text"), " ")
    val grams = graft.engine.Tables.documents(spark, sfDir)
      .select(t.as("t")).filter(size(col("t")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("t")) - 2),
        i => array_join(slice(col("t"), i + 1, lit(2)), " "))).as("g"))
    val n = grams.count()
    val exact = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") * 1000 > n)
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(viaSketch == exact && viaSketch.nonEmpty)
  }
}
