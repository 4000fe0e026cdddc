package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Telemetry

/** Property guards for the event-telemetry operators — invariants the
  * DuckDB oracle compare cannot express directly (it re-runs the same
  * formula; these pin the SEMANTICS the formula is supposed to have).
  */
class TelemetrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q119 split is temporally sound: no user's train event follows a test event") {
    val split = Telemetry.q119TemporalSplit.run(spark, sfDir)
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val joined = split.join(events, Seq("event_id", "user_id"))
    // the leakage property: per user, max(train ts) < min(test ts) —
    // with (ts, event_id) as the tiebreak order, boundary equality is
    // allowed only when the order key still separates them, so compare
    // on the full order key
    val bad = joined.as[(Long, Long, String, java.time.LocalDateTime)]
      .collect()
      .groupBy(_._2)
      .filter { case (_, rows) =>
        val train = rows.filter(_._3 == "train").map(r => (r._4, r._1))
        val test = rows.filter(_._3 == "test").map(r => (r._4, r._1))
        train.nonEmpty && test.nonEmpty && {
          implicit val ord: Ordering[(java.time.LocalDateTime, Long)] =
            Ordering.Tuple2(Ordering.fromLessThan(_ isBefore _), Ordering.Long)
          ord.gt(train.max, test.min)
        }
      }
    assert(bad.isEmpty, s"temporal leakage for users: ${bad.keys.take(5)}")
  }

  test("q119 honors the 80/20 cut exactly per user") {
    val counts = Telemetry.q119TemporalSplit.run(spark, sfDir)
      .groupBy("user_id")
      .agg(
        sum(when(col("split") === "train", 1).otherwise(0)).as("tr"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    counts.foreach { case (u, tr, n) =>
      assert(tr === (n * 4) / 5, s"user $u: $tr train of $n")
    }
  }

  test("q129 bucketized range join equals the theta join, with no nested-loop plan") {
    val df = Telemetry.q129RangeJoin.run(spark, sfDir)
    val got = df.as[(Long, Long, Long)].collect().toSet
    // naive theta-join ground truth on the same data
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .as[(Long, String, Long)].collect()
    val clicks = ev.filter(_._2 == "click"); val buys = ev.filter(_._2 == "purchase")
    val expected = (for {
      (ca, _, ta) <- clicks
      (pb, _, tb) <- buys
      if math.abs(ta - tb) <= 60000000L
    } yield (ca, pb, tb - ta)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // the whole point of the cell quantization: a KEYED join, never a
    // broadcast-nested-loop or cartesian scan of |A|x|B|
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must plan as an equi-join on cell:\n$p")
  }

  test("rangeJoinPairs kernel matches brute force on random instances") {
    // the cell-covering argument (an interval of width 2*delta meets at
    // most the two endpoint cells, and each pair exactly once) is the
    // load-bearing claim — check it on seeded random data across deltas
    // that force boundary collisions (delta ~ gap scale) and sparse hits
    val rng = new scala.util.Random(42)
    for (delta <- Seq(3L, 50L, 1000L)) {
      val as = Seq.tabulate(150)(i => (i.toLong, rng.nextLong(10000L)))
      val bs = Seq.tabulate(150)(i => (1000L + i, rng.nextLong(10000L)))
      val got = Telemetry.rangeJoinPairs(
          as.toDF("aid", "ta"), bs.toDF("bid", "tb"), delta)
        .select("aid", "bid").as[(Long, Long)].collect()
      val expected = for {
        (ai, ta) <- as; (bi, tb) <- bs
        if math.abs(ta - tb) <= delta
      } yield (ai, bi)
      assert(got.sorted.toSeq === expected.sorted.toSeq,
        s"delta=$delta: kernel disagrees with brute force (or duplicates pairs)")
    }
  }
}
