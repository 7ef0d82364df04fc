package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlDedup.normalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("normalizeUrl: every rule, rule by rule") {
    assert(norm("https://example.com/a#frag") == Seq("https://example.com/a"))
    assert(norm("HTTPS://Example.COM/CaseKept") ==
      Seq("https://example.com/CaseKept")) // path case preserved
    assert(norm("https://www.example.com/a") == Seq("https://example.com/a"))
    assert(norm("http://example.com:80/a", "https://example.com:443/a") ==
      Seq("http://example.com/a", "https://example.com/a"))
    assert(norm("https://example.com:8443/a") ==
      Seq("https://example.com:8443/a")) // non-default port kept
    assert(norm("https://example.com/a/", "https://example.com/a///") ==
      Seq("https://example.com/a", "https://example.com/a"))
    assert(norm("https://example.com/a?utm_source=x&z=1&utm_campaign=y") ==
      Seq("https://example.com/a?z=1"))
    assert(norm("https://example.com/a?z=1&a=2&fbclid=abc&gclid=g&ref=r") ==
      Seq("https://example.com/a?a=2&z=1")) // survivors sorted bytewise
    assert(norm("https://example.com/a?utm_source=x") ==
      Seq("https://example.com/a")) // emptied query loses its '?'
    // the whole mess at once
    assert(norm("HTTPS://WWW.Example.com:443/Path/?utm_source=f&b=2&a=1#sec") ==
      Seq("https://example.com/Path?a=1&b=2"))
    // referential params that merely START like tracking ones survive
    assert(norm("https://example.com/a?reference=x&utm=keepme") ==
      Seq("https://example.com/a?reference=x&utm=keepme"))
  }

  test("normalizeUrl: non-absolute / malformed URLs normalize to NULL, " +
      "never to a shared collapsed key (r16 ADVICE)") {
    // each of these used to canonicalize to '://'+query and silently
    // merge as one duplicate group
    assert(norm("relative/path", "example.com/x", "mailto:u@e.com", "",
      "://broken", "1http://bad.scheme.com/a") ==
      Seq(null, null, null, null, null, null))
    // scheme grammar per RFC 3986: letter, then letters/digits/+.-
    assert(norm("ftp+ssh://h/x", "a2-x.y://h/x") ==
      Seq("ftp+ssh://h/x", "a2-x.y://h/x"))
  }

  test("dedupByUrlKeepBest: max priority wins, min-id tie-break, null " +
      "priority never wins, all-null group falls back to min id, " +
      "null/malformed urls pass through") {
    val df = Seq(
      // group A: 2 has the newest fetch -> kept
      (1L, "https://www.a.com/x", 100L),
      (2L, "HTTPS://a.com/x/", 200L),
      // group B: tie on priority -> min id 3 kept
      (3L, "https://a.com/y?utm_source=f", 50L),
      (4L, "https://a.com/y", 50L),
      // group C: null priority loses to a real one even with smaller id
      (5L, "https://a.com/z", -1L),
      (6L, "https://a.com/z/", 10L),
      // group D: all-null priorities -> min id 7 kept
      (7L, "https://a.com/w", -1L),
      (8L, "https://a.com/w/", -1L),
      // pass-throughs
      (9L, null.asInstanceOf[String], 1L),
      (10L, "not a url", 1L))
      .toDF("doc_id", "url", "ts")
      .withColumn("ts", when(col("ts") === -1L, lit(null)).otherwise(col("ts")))
    val kept = UrlDedup.dedupByUrlKeepBest(df, "doc_id", "url", col("ts"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 6L, 7L, 9L, 10L))
    // schema untouched: helper columns dropped
    assert(UrlDedup.dedupByUrlKeepBest(df, "doc_id", "url", col("ts"))
      .columns.toSeq == Seq("doc_id", "url", "ts"))
    // loud on non-numeric priority
    val e = intercept[IllegalArgumentException] {
      UrlDedup.dedupByUrlKeepBest(df, "doc_id", "url",
        col("ts").cast("string"))
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("dedupByUrl: keep-first by id per canonical URL; null urls pass " +
      "through; non-duplicates untouched") {
    val df = Seq(
      (1L, "https://www.a.com/x", "one"),
      (2L, "HTTPS://a.com/x/", "two"),      // dup of 1 after normalize
      (3L, "https://a.com/y?utm_source=f", "three"),
      (4L, "https://a.com/y", "four"),      // dup of 3
      (5L, null.asInstanceOf[String], "five"),
      (6L, null.asInstanceOf[String], "six"))
      .toDF("doc_id", "url", "text")
    val kept = UrlDedup.dedupByUrl(df, "doc_id", "url")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 6L))
    val groups = UrlDedup.urlGroups(df, "doc_id", "url")
      .as[(String, Long, Long)].collect().toSeq
    assert(groups.size == 2)
  }

  test("hostStats: per-host doc and canonical counts surface mirrors") {
    val df = Seq(
      (1L, "https://a.com/x"), (2L, "https://www.a.com/x/"),
      (3L, "https://a.com/y"), (4L, "https://b.com/x"))
      .toDF("doc_id", "url")
    val got = UrlDedup.hostStats(df, "doc_id", "url")
      .orderBy("host").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a.com", 3L, 2L), ("b.com", 1L, 1L)))
  }
}
