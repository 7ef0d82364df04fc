package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase prefix sum equals the single-partition window exactly") {
    // pseudo-random but deterministic values over a few thousand rows,
    // spread across many partitions
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("v", pmod(xxhash64(col("id")), lit(97L)))
      .repartition(16)
    val naive = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    val fast = PrefixSum.withRunningTotal(spark, df, "id", "v", "cum",
        numPartitions = 8)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    assert(fast == naive)
  }

  test("running total is inclusive and starts at the first value") {
    val df = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val got = PrefixSum.withRunningTotal(spark, df, "id", "v", "cum",
        numPartitions = 2)
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 15L), (3L, 22L)))
  }

  test("empty input yields empty output (no driver-side failure)") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(PrefixSum.withRunningTotal(spark, df, "id", "v", "cum").count() == 0)
  }
}
