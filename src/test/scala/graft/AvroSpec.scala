package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Staging
import graft.sources.Avro

/** Conventions of the hand-rolled Avro OCF interchange the q267 gate
  * can't single out: logical-type edge values (negative/pre-1970,
  * micros precision, decimal sign extension), nulls in every type,
  * empty partitions, and schema fidelity both directions.
  */
class AvroSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("round-trip preserves every logical-type edge value, nulls, and schema") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("dec", DecimalType(12, 2), nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("ntz", TimestampNTZType, nullable = true),
      StructField("bin", BinaryType, nullable = true),
      StructField("i", IntegerType, nullable = true),
      StructField("f", DoubleType, nullable = true),
      StructField("b", BooleanType, nullable = true)))
    def ts(s: String, micros: Int): java.sql.Timestamp = {
      val t = java.sql.Timestamp.valueOf(s)
      t.setNanos(micros * 1000); t
    }
    val rows = Seq(
      Row(1L, "plain", new java.math.BigDecimal("12345.67"),
        java.sql.Date.valueOf("2001-09-09"), ts("2001-09-09 01:46:40", 123456),
        java.time.LocalDateTime.parse("2001-09-09T01:46:40.654321"),
        Array[Byte](1, 2, -3), 42, 1.5, true),
      // negative decimal: two's-complement unscaled bytes must
      // sign-extend; pre-1970 date and timestamp: negative epoch values
      Row(2L, "", new java.math.BigDecimal("-0.01"),
        java.sql.Date.valueOf("1932-03-05"), ts("1955-11-05 06:15:00", 1),
        java.time.LocalDateTime.parse("1905-06-27T23:59:59.000001"),
        Array.empty[Byte], -7, -0.0, false),
      Row(3L, null, null, null, null, null, null, null, null, null),
      // pre-1970 timestamp with a >=1ms fractional second: getTime's ms
      // component is then non-zero AND negative-signed, the exact case
      // where a truncating `/ 1000` (instead of floorDiv) writes the
      // micros value one full second late
      Row(4L, "pre-epoch-ms", null, null, ts("1955-11-05 06:15:00", 123456),
        null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Staging.scratch("graft-avro-spec", "roundtrip").getAbsolutePath
    val files = Avro.writeAvro(df, dir)
    assert(files.size == 2, "one container per partition")
    val back = Avro.readAvro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    val want = rows.sortBy(_.getLong(0))
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { j =>
        (g.get(j), w.get(j)) match {
          case (a: Array[Byte], b: Array[Byte]) =>
            assert(a.toSeq == b.toSeq, s"col ${schema(j).name}")
          case (a, b) => assert(a == b, s"col ${schema(j).name}: $a vs $b")
        }
      }
    }
  }

  test("an empty partition still writes a schema-only container the reader accepts") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v").repartition(4) // 3 empty partitions
    val dir = Staging.scratch("graft-avro-spec", "empty").getAbsolutePath
    val files = Avro.writeAvro(df, dir)
    assert(files.size == 4)
    val back = Avro.readAvro(spark, dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x")))
  }

  test("schema resolution guards: missing non-nullable and type mismatch fail loudly") {
    import spark.implicits._
    val dir = Staging.scratch("graft-avro-spec", "resolve").getAbsolutePath
    Avro.writeAvro(Seq((1L, "x")).toDF("k", "v"), dir)
    // a reader field the writer lacks must be nullable
    intercept[IllegalArgumentException] {
      Avro.readAvroAs(spark, dir, StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("extra", LongType, nullable = false)))).collect()
    }
    // shared fields must agree on type — no silent coercion
    intercept[IllegalArgumentException] {
      Avro.readAvroAs(spark, dir, StructType(Seq(
        StructField("k", IntegerType, nullable = true)))).collect()
    }
    // happy path: drop v, add nullable w, reorder — resolved by name
    val got = Avro.readAvroAs(spark, dir, StructType(Seq(
      StructField("w", StringType, nullable = true),
      StructField("k", LongType, nullable = true)))).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq((null, 1L)))
  }

  test("unsupported types fail loudly at write time, never as corrupt files") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    val dir = Staging.scratch("graft-avro-spec", "unsupported").getAbsolutePath
    intercept[IllegalArgumentException](Avro.writeAvro(df, dir))
  }
}
