package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy contracts for the approximate sketches the engine recommends
  * at 100 TB (one-pass, mergeable, no per-group sort): these never appear
  * in the strict oracle gate (approximation is engine-specific by nature),
  * so their error envelopes are pinned here against exact computation on
  * real test data instead. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct (HLL++) lands within its 5% default rsd of exact") {
    val (approx, exact) = li.select(
        approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].head()
    val rel = math.abs(approx - exact).toDouble / exact
    assert(rel <= 0.05, s"approx=$approx exact=$exact rel=$rel")
  }

  test("approx_percentile (t-digest-style) tracks exact percentile on grouped data") {
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5)).as("exact_med"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_med"))
      .select("exact_med", "approx_med").as[(Double, Double)].collect()
    rows.foreach { case (e, a) =>
      assert(math.abs(a - e) / e <= 0.02, s"approx median $a vs exact $e")
    }
  }

  test("sketches are mergeable: per-partition HLL union equals whole-frame estimate") {
    // the property that makes the sketch the 100 TB path: computing per
    // partition and merging gives the same estimate as one global pass
    val whole = li.select(approx_count_distinct(col("l_suppkey"))).as[Long].head()
    val merged = li.repartition(8)
      .select(approx_count_distinct(col("l_suppkey"))).as[Long].head()
    assert(whole == merged) // HLL register merge is exact over partitionings
  }
}
