package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Similarity

/** Cross-checks for q197's product quantization, independent of the
  * DuckDB oracle: rerun quantize → subspace encode → ADC in plain Scala
  * on the driver and pin (1) the fundamental ADC identity — the emitted
  * distance IS the exact integer d² between the query and the vector's
  * codebook reconstruction, (2) codebook vectors are fixpoints of
  * encode (each encodes to its own code in every subspace), and (3) the
  * gate query's emitted rows equal the driver recompute end to end.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def quantize(e: Seq[Float]): Array[Long] =
    // BigDecimal HALF_UP, matching Spark's round() exactly
    e.map(x => new java.math.BigDecimal(x.toDouble * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue).toArray

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum

  private lazy val vecs: Map[Long, Array[Long]] =
    Tables.widen(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1))).toMap

  private lazy val cb: Array[Array[Array[Long]]] =
    Array.tabulate(4, 16)((sp, code) =>
      vecs(code.toLong).slice(sp * 16, sp * 16 + 16))

  private def encode(v: Array[Long]): Array[Int] =
    Array.tabulate(4) { sp =>
      val sub = v.slice(sp * 16, sp * 16 + 16)
      (0 until 16).minBy(code => (d2(sub, cb(sp)(code)), code))
    }

  test("ADC identity: emitted distance = exact d²(query, reconstruction)") {
    val qv = vecs(0L)
    val out = Similarity.q197PqAdc.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val codes = Array(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      val reconstruction = (0 until 4).flatMap(sp => cb(sp)(codes(sp))).toArray
      assert(r.getLong(5) == d2(qv, reconstruction),
        s"vec ${r.getLong(0)}: ADC != d2(query, reconstruction)")
    }
  }

  test("codebook vectors are fixpoints of encode") {
    for (code <- 0 until 16) {
      assert(encode(vecs(code.toLong)).toSeq == Seq.fill(4)(code),
        s"codebook vector $code must encode to itself in every subspace")
    }
  }

  test("gate query equals the driver recompute end to end") {
    val qv = vecs(0L)
    val lut = Array.tabulate(4, 16)((sp, code) =>
      d2(qv.slice(sp * 16, sp * 16 + 16), cb(sp)(code)))
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val codes = encode(v)
        (id, codes(0), codes(1), codes(2), codes(3),
          (0 until 4).map(sp => lut(sp)(codes(sp))).sum)
      }
      .sortBy { case (id, _, _, _, _, d) => (d, id) }
      .take(10)
    val got = Similarity.q197PqAdc.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("q202 IVF-PQ: one pruned cluster, ADC distances match re-encode, ascending") {
    val qv = vecs(0L)
    val lut = Array.tabulate(4, 16)((sp, code) =>
      d2(qv.slice(sp * 16, sp * 16 + 16), cb(sp)(code)))
    val rows = Similarity.q202IvfPq.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty && rows.size <= 5)
    // the probe reads exactly ONE inverted list
    assert(rows.map(_._2).distinct.size == 1, "probe must touch a single cluster")
    // each emitted distance is the ADC of the vector's own re-encoded codes
    for ((id, _, dist) <- rows) {
      val codes = encode(vecs(id))
      assert(dist == (0 until 4).map(sp => lut(sp)(codes(sp))).sum,
        s"vec $id: emitted ADC != re-encoded ADC")
    }
    assert(rows.map(_._3) == rows.map(_._3).sorted, "ascending by ADC")
    assert(!rows.exists(_._1 == 0L), "the query never matches itself")
  }
}
