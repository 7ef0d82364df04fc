package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // points 0..99; intervals of assorted widths, incl. empty and bin-spanning
  private lazy val points = (0L until 100L).map(i => (i, i)).toDF("pid", "x")
  private lazy val intervals = Seq(
    (1L, 0L, 10L),    // covers 0..9
    (2L, 5L, 6L),     // single point 5
    (3L, 90L, 120L),  // spans past the domain
    (4L, 50L, 50L),   // empty (hi == lo)
    (5L, 60L, 40L),   // inverted (hi < lo)
    (6L, 31L, 33L)    // crosses the 32-wide bin boundary
  ).toDF("iid", "lo", "hi")

  test("pointInRange matches the brute-force interval join exactly") {
    val got = RangeJoin.pointInRange(points, "x", intervals, "lo", "hi", binWidth = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expected = (for {
      p <- 0L until 100L
      (iid, lo, hi) <- Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 90L, 120L),
        (4L, 50L, 50L), (5L, 60L, 40L), (6L, 31L, 33L))
      if p >= lo && p < hi
    } yield (p, iid)).toSet
    assert(got == expected)
    assert(!got.exists { case (_, iid) => iid == 4L || iid == 5L }) // empty/inverted drop
  }

  test("pointInRange emits each matching pair exactly once (no bin-duplication)") {
    val out = RangeJoin.pointInRange(points, "x", intervals, "lo", "hi", binWidth = 4)
    assert(out.count() == out.select("pid", "iid").distinct().count())
  }

  test("pointInRange plans an equi-join, not a nested-loop/cartesian product") {
    val plan = RangeJoin.pointInRange(points, "x", intervals, "lo", "hi", binWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated to a product:\n$plan")
  }

  test("saltedInnerJoin equals the plain join and spreads hot keys across salts") {
    // skewed left: key 1 has 900 of 1000 rows
    val left = ((0 until 900).map(i => (i.toLong, 1L)) ++
      (900 until 1000).map(i => (i.toLong, (i % 7).toLong))).toDF("row_id", "k")
    val right = (0L until 8L).map(k => (k, s"v$k")).toDF("k", "payload")
    val salted = SkewJoin.saltedInnerJoin(left, right, Seq("k"), "row_id", 16)
    val plain  = left.join(right, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.select("row_id", "k", "payload").as[(Long, Long, String)].collect().toSet ==
      plain.select("row_id", "k", "payload").as[(Long, Long, String)].collect().toSet)
    // the hot key's rows really do carry >1 distinct salt pre-join
    val salts = left.filter(col("k") === 1)
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(16L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 8, s"hot key spread over only $salts salts")
  }

  test("saltedInnerJoin is deterministic across runs (no rand() salting)") {
    val left = (0L until 50L).map(i => (i, i % 3)).toDF("row_id", "k")
    val right = (0L until 3L).map(k => (k, k * 10)).toDF("k", "w")
    val a = SkewJoin.saltedInnerJoin(left, right, Seq("k"), "row_id", 4)
      .orderBy("row_id").collect().toSeq
    val b = SkewJoin.saltedInnerJoin(left, right, Seq("k"), "row_id", 4)
      .orderBy("row_id").collect().toSeq
    assert(a == b)
  }
}
