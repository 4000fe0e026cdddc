package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Adversarial cases for the q206 URL canonicalizer — each rule hit
  * alone and in combination, plus the invariants (idempotence, alias
  * families collapsing to one key) the oracle compare only exercises on
  * the synthesized gate corpus.
  */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: Seq[String]): Seq[String] =
    urls.toDF("url").select(Dedup.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("each canonicalization rule, alone and stacked") {
    val cases = Seq(
      // scheme/host case
      "HTTP://Example.COM/a" -> "http://example.com/a",
      // default ports stripped, non-default kept
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:80/a" -> "http://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // www. stripped only as a prefix label
      "https://www.example.com/a" -> "https://example.com/a",
      "https://wwwx.example.com/a" -> "https://wwwx.example.com/a",
      // fragment dropped
      "https://example.com/a#frag" -> "https://example.com/a",
      // duplicate slashes collapsed, trailing slash stripped (non-root)
      "https://example.com/a//b///c/" -> "https://example.com/a/b/c",
      "https://example.com/" -> "https://example.com/",
      // tracking params dropped, survivors sorted; bare '?' dropped
      "https://example.com/a?utm_source=x&b=2&a=1" -> "https://example.com/a?a=1&b=2",
      "https://example.com/a?fbclid=zzz" -> "https://example.com/a",
      "https://example.com/a?" -> "https://example.com/a",
      // path case preserved (case-sensitive servers)
      "https://example.com/A/B" -> "https://example.com/A/B",
      // everything at once
      "HTTPS://WWW.Example.COM:443//x//y/?utm_campaign=c&z=9&a=1#top" ->
        "https://example.com/x/y?a=1&z=9")
    assert(canon(cases.map(_._1)) === cases.map(_._2))
  }

  test("canonicalization is idempotent and collapses an alias family to one key") {
    val family = Seq(
      "http://www.news.example.com:80/2024//story/?utm_source=tw&id=7",
      "HTTP://News.Example.Com/2024/story?id=7#read",
      "http://news.example.com/2024/story/?id=7&utm_medium=social")
    val once = canon(family)
    assert(once.toSet.size === 1)
    assert(canon(once) === once) // fixpoint: canon(canon(u)) = canon(u)
  }

  test("q206 groups sum to the corpus and first_doc is a group member minimum") {
    val rows = Dedup.q206UrlCanon.run(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
    val total = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(rows.map(_._2).sum === total)
    assert(rows.forall(r => r._2 >= 1 && r._3 >= 0))
    assert(rows.exists(_._2 > 1), "no URL family collapsed — construction broken")
  }
}
