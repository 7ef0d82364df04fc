package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HashFnsSpec extends SparkSpec {
  import spark.implicits._

  test("md5Concat: positional concat, null -> empty string (C13 shape)") {
    val df = Seq(("a", Some("b")), ("a", None)).toDF("x", "y")
      .select(HashFns.md5Concat(Seq(col("x"), col("y"))).as("h"))
    val Seq(h1, h2) = df.as[String].collect().toSeq
    // null collapses to "", so ("a", null) hashes like plain "a"
    assert(h2 == java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(h1 != h2)
  }

  test("sha2Pipe: '|'-joined, stable across runs, distinct for swapped fields") {
    val df = Seq(("a", "b"), ("b", "a")).toDF("x", "y")
      .select(HashFns.sha2Pipe(Seq(col("x"), col("y"))).as("h"))
    val hs = df.as[String].collect().toSeq
    assert(hs.distinct.size == 2)
    val again = Seq(("a", "b")).toDF("x", "y")
      .select(HashFns.sha2Pipe(Seq(col("x"), col("y"))).as("h"))
      .as[String].head()
    assert(again == hs.head)
  }

  test("canonicalRowHash separates keys from identical payloads (fixes §2.12 defect)") {
    // same payload under two different keys must produce two hashes
    val df = Seq(("T1", 10.0), ("T2", 10.0)).toDF("ticker", "close")
      .select(HashFns.canonicalRowHash(Seq(col("ticker")), Seq(col("close"))).as("h"))
    assert(df.as[String].collect().distinct.length == 2)
  }

  test("fastHash is deterministic within a session") {
    val a = Seq(("x", 1)).toDF("s", "i")
      .select(HashFns.fastHash(Seq(col("s"), col("i"))).as("h")).as[Long].head()
    val b = Seq(("x", 1)).toDF("s", "i")
      .select(HashFns.fastHash(Seq(col("s"), col("i"))).as("h")).as[Long].head()
    assert(a == b)
  }
}
