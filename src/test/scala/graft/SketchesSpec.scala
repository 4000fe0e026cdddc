package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.Dedup

/** Native sketch expressions (graft_minhash16 / graft_simhash16) must be
  * bit-identical to the relational md5-based formulation they replaced —
  * that relational form is what the DuckDB oracle still computes.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }
  private val sfDir = "/root/testdata/sf0.01"

  test("minhash16 matches the relational explode+min formulation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 4002).as("toks"))
    // relational twin: explode shingles -> md5 id -> 16 mins per doc
    val sh = docs
      .select(col("doc_id"), explode(
        when(size(col("toks")) >= 3,
          transform(sequence(lit(1), size(col("toks")) - 2),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("s"))
      .select(col("doc_id"),
        (conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long") % 2147483647L).as("sid"))
    val relational = sh
      .select(col("doc_id") +: (0 until 16).map(j =>
        ((lit(2L * j + 1) * col("sid") + lit(j.toLong * j + 7)) % 2147483647L).as(s"h$j")): _*)
      .groupBy("doc_id")
      .agg(min("h0").as("m0"), (1 until 16).map(j => min(s"h$j").as(s"m$j")): _*)
      .select(col("doc_id"), array((0 until 16).map(j => col(s"m$j")): _*).as("mh"))
    val native = docs
      .select(col("doc_id"), GraftFunctions.minhash16(col("toks")).as("mh"))
      .filter(col("mh").isNotNull)
    val joined = relational.alias("r").join(native.alias("n"), "doc_id")
      .select($"doc_id", $"r.mh".as("rmh"), $"n.mh".as("nmh"))
    assert(joined.count() === relational.count())
    assert(joined.filter($"rmh" =!= $"nmh").isEmpty, "minhash mismatch")
  }

  test("simhash16 dedupes tokens and handles short/empty docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),   // duplicates must count once
      (2L, "  "),           // only empty tokens
      (3L, "x")             // single token
    ).toDF("doc_id", "text")
      .select(col("doc_id"), GraftFunctions.simhash16(split(col("text"), " ")).as("s"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: equals simhash of distinct {a,b,c}
    val expected = Seq((9L, "a b c")).toDF("doc_id", "text")
      .select(GraftFunctions.simhash16(split(col("text"), " ")).as("s"))
      .collect().head.getLong(0)
    assert(rows(1L) === expected)
    // all-empty token doc: zero votes -> all bits zero
    assert(rows(2L) === 0L)
  }

  test("q22 via native sketch returns the recorded sf0.01 candidate count") {
    val n = Dedup.q22MinhashLsh.run(spark, sfDir).count()
    assert(n === 46L) // matches CORRECTNESS_r02 + current oracle
  }

  test("q126 carried-source matrix equals the join-back recompute from q22 pairs") {
    import spark.implicits._
    // the source label riding into the LSH bucket is an optimization
    // (saves two corpus-sized joins), not a semantics change: the matrix
    // must equal aggregating q22's pair output joined back to doc→source
    val reported = Dedup.q126SourceOverlap.run(spark, sfDir)
      .as[(String, String, Long)].collect().toSet
    val srcOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val fromPairs = Dedup.q22MinhashLsh.run(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSet
    assert(reported.nonEmpty)
    assert(reported === fromPairs)
  }

  test("q216 prefix join agrees with q24's capped kernel and actually prunes") {
    import spark.implicits._
    // agreement: on q24's id<1000 slice the two exact forms must emit
    // identical pairs (same τ) — the filter is lossless, not approximate
    val pp = Dedup.q216PrefixJoin.run(spark, sfDir)
      .filter(col("doc_a") < 1000 && col("doc_b") < 1000)
      .select("doc_a", "doc_b", "n_common", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    val inv = Dedup.q24NgramJaccard.run(spark, sfDir)
      .select("doc_a", "doc_b", "n_common", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pp === inv && pp.nonEmpty)
    // effectiveness: candidate mass from prefix postings must be well
    // under the full inverted index's (the whole point of the order)
    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val shingles = docs.map { case (id, t) =>
      id -> t.split(" ").sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val freq = shingles.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    def pairsOf(posting: Map[String, Seq[Long]]): Long =
      posting.values.map(v => v.size.toLong * (v.size - 1) / 2).sum
    val full = pairsOf(shingles.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
    val pref = pairsOf(shingles.toSeq.flatMap { case (id, ss) =>
      val sorted = ss.toSeq.sortBy(x => (freq(x), x))
      val p = sorted.size - (sorted.size + 1) / 2 + 1
      sorted.take(p).map(_ -> id)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
    assert(pref * 2 <= full,
      s"prefix candidates $pref not under half of full $full — ordering broken")
  }
}
