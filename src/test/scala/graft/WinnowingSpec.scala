package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for q238's winnowing selection: exact agreement with a
  * plain-Scala reference on adversarial token streams, plus the paper's
  * two guarantees — every window of w consecutive k-gram positions
  * contributes a selection (coverage), and ties break RIGHTMOST.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 4

  /** The reference: hash k-grams like Dedup.md5Id, pack (hash, pos),
    * take the min per window of W consecutive starts.
    */
  private def reference(toks: Seq[String]): (Long, Seq[Long]) = {
    def md5Id(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2147483647L
    }
    val m = toks.length - 2
    val codes = (1 to m).map(i =>
      md5Id(s"${toks(i - 1)} ${toks(i)} ${toks(i + 1)}") * 4096L + 4095L - i)
    val sel =
      if (m < W) Seq.empty[Long]
      else (0 to m - W).map(p => codes.slice(p, p + W).min).distinct
    (math.max(m, 0).toLong, sel)
  }

  test("engine selection equals the reference on real documents") {
    val out = graft.operators.TextAnalysis.q238Winnowing
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(50).foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1).take(4002).toSeq
      val (nk, sel) = reference(toks)
      assert(r.getLong(1) == nk, s"doc ${r.getLong(0)} n_kgrams")
      assert(r.getLong(2) == sel.length.toLong, s"doc ${r.getLong(0)} n_sel")
      assert(r.getLong(4) == sel.sum % 2147483647L, s"doc ${r.getLong(0)} checksum")
    }
  }

  test("coverage: every window of W starts contains a selected position") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").limit(20).collect().map(_.getString(0))
    texts.foreach { t =>
      val toks = t.split(" ", -1).take(4002).toSeq
      val m = toks.length - 2
      if (m >= W) {
        val (_, sel) = reference(toks)
        val selPos = sel.map(c => 4095L - c % 4096L).toSet
        (1 to m - W + 1).foreach { p =>
          assert((p until p + W).exists(i => selPos.contains(i.toLong)),
            s"window starting at $p has no selected k-gram")
        }
      }
    }
  }

  test("ties break rightmost via the packed position complement") {
    // identical k-grams everywhere: all hashes equal, so every window's
    // min is its RIGHTMOST position (largest pos = smallest 4095-pos)
    val toks = Seq.fill(10)("x")
    val (_, sel) = reference(toks)
    val selPos = sel.map(c => 4095L - c % 4096L).sorted
    // windows [1..4],[2..5],...,[5..8] each select their last position
    assert(selPos == Seq(4L, 5L, 6L, 7L, 8L))
  }
}
