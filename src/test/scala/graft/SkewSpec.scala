package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew handling: a join whose one key carries almost all the
  * rows must be re-planned at runtime with the skewed partition split —
  * the engine's answer to hot keys when salting (operators.Skew) isn't
  * wired in. Thresholds are lowered so testdata-scale skew triggers the
  * same code path 100 TB skew would.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key (0) with ~50k rows, 50 cold keys with 10 rows each
      val hot = spark.range(50000).select(lit(0L).as("k"), col("id").as("payload"))
      val cold = spark.range(500).select((col("id") % 50 + 1).as("k"), col("id").as("payload"))
      val left = hot.unionAll(cold)
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 2).as("dim"))
      val joined = left.join(right, "k")
      joined.queryExecution.executedPlan.execute().count()
      val p = joined.queryExecution.executedPlan.toString
      val finalP = p.indexOf("== Initial Plan ==") match {
        case -1 => p
        case i => p.substring(0, i)
      }
      assert(finalP.contains("isFinalPlan=true"))
      assert(finalP.contains("skew=true"),
        s"expected AQE to mark the join skewed:\n$finalP")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
