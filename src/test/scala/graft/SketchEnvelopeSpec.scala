package graft

import org.apache.spark.sql.functions._

/** Pins the TIGHT (3-sigma) sketch envelopes on the fixed test corpus.
  *
  * q56's oracle gate asserts the sketch booleans at literal TRUE, so the
  * gate itself uses the essentially-zero-false-positive 5-sigma bound (a
  * bit-exact gate must never fail spuriously on new data — ADVICE r4).
  * The statistical claim that HLL++ actually lands within 3 sigma of its
  * published rsd belongs in a test on a FIXED corpus, where a failure is
  * a real regression rather than sampling noise: that is this spec. */
class SketchEnvelopeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("HLL++ distinct estimate lands within 3 sigma (6%) on the fixed corpus") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.06,
        s"flag=${r.get(0)}: HLL++ rel err $relErr exceeds 3-sigma bound 0.06")
    }
  }

  test("approx_percentile(10000) lands inside the exact p45..p55 bracket") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"),
          array(lit(0.45), lit(0.5), lit(0.55))).as("p"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("ap"))
      .collect()
    rows.foreach { r =>
      val p = r.getSeq[Any](1).map(_.toString.toDouble)
      val ap = r.get(2).toString.toDouble
      assert(ap >= p.head && ap <= p.last,
        s"flag=${r.get(0)}: approx p50 $ap outside exact [${p.head}, ${p.last}]")
    }
  }
}
