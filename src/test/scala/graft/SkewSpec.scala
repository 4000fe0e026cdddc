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

  test("AQE skew-join vs manual salting on q82's workload: where each applies") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // The zero-code alternative to operators.Skew.saltedJoin: the NAIVE
    // join under adaptive.skewJoin, thresholds lowered so testdata-scale
    // skew (event_type is genuinely hot on view/click) takes the same
    // runtime split a 100 TB hot key would. The boundary this test pins
    // (and PLANS.md documents): AQE splits a skewed JOIN only when
    // nothing downstream requires the join key's hash distribution —
    // q82's real shape (join feeding a SAME-KEY groupBy) makes the
    // split illegal (it would break the aggregate's clustering), so AQE
    // declines and manual salting remains the only cure there.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      val p = df.queryExecution.executedPlan.toString
      p.indexOf("== Initial Plan ==") match {
        case -1 => p
        case i => p.substring(0, i)
      }
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val dim = Seq(("click", "0.05"), ("error", "0.00"), ("purchase", "4.00"),
        ("signup", "1.50"), ("view", "0.01")).toDF("event_type", "unit_cost")
        .select(col("event_type"), col("unit_cost").cast("decimal(6,2)").as("unit_cost"))
      // testdata event types are near-uniform, so manufacture the hot
      // key a 100 TB workload would have: every 'view' row replicated
      // 200x (the replica index folded into event_id keeps the salt
      // source distinct per row, as real event ids would be). The
      // repartition(8) is load-bearing for the TEST, not the technique:
      // AQE splits a skewed reduce partition at MAPPER granularity, and
      // the single-row-group testdata parquet yields ONE map task —
      // nothing to split by. A 100 TB fact has thousands of mappers;
      // 8 emulates that.
      val fact = graft.engine.Tables.events(spark, sfDir)
        .select(col("event_type"), col("event_id"),
          col("value").cast("decimal(18,2)").as("value"))
        .repartition(8, col("event_id"))
        .withColumn("__r", explode(sequence(lit(1L),
          when(col("event_type") === "view", 200L).otherwise(1L))))
        .withColumn("event_id", col("event_id") * 1000 + col("__r"))
        .drop("__r")
      // (a) join output consumed WITHOUT a same-key distribution
      // requirement (global total): AQE splits the hot partitions, and
      // the salt-free result equals the salted kernel's — exactly
      // (decimal sums are order-insensitive)
      val plainTotal = fact.join(dim, "event_type")
        .agg(sum(col("value") * col("unit_cost")).as("total"))
      val gotTotal = plainTotal.collect().head.getDecimal(0)
      val fp = finalPlan(plainTotal)
      assert(fp.contains("isFinalPlan=true"))
      assert(fp.contains("skew=true"),
        s"expected AQE to split the skewed join partitions:\n$fp")
      val saltedTotal = graft.operators.Skew
        .saltedJoin(fact, dim, "event_type", saltSource = col("event_id"), salts = 8)
        .agg(sum(col("value") * col("unit_cost")).as("total"))
        .collect().head.getDecimal(0)
      assert(gotTotal == saltedTotal, s"$gotTotal != $saltedTotal")
      // (b) q82's true shape — join feeding a SAME-KEY aggregation:
      // the split would violate the aggregate's required clustering,
      // so AQE must decline (this is WHY q82 keeps explicit salting)
      val sameKey = fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(sum(col("value") * col("unit_cost")).cast("double").as("total_cost"))
        .orderBy("event_type")
      sameKey.collect()
      val fp2 = finalPlan(sameKey)
      assert(fp2.contains("isFinalPlan=true"))
      assert(!fp2.contains("skew=true"),
        s"AQE must decline the split under a same-key aggregation:\n$fp2")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
