package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropManaged(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed prior run can leave the managed location without the
    // catalog entry; saveAsTable then refuses with LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  private lazy val orders = (1L to 500L).map(k => (k, s"order_$k")).toDF("key", "o_payload")
  private lazy val items  = (1L to 500L).flatMap(k => Seq((k, k * 10), (k, k * 10 + 1)))
    .toDF("key", "i_payload")

  // shared fixture, (re)built on first touch per run so each test stands
  // alone (no sibling-test ordering dependency)
  private lazy val fixture: Unit = {
    dropManaged("bkt_orders"); dropManaged("bkt_items")
    Bucketing.writeBucketed(orders, "bkt_orders", Seq("key"), 4)
    Bucketing.writeBucketed(items, "bkt_items", Seq("key"), 4)
  }

  test("co-bucketed tables join with ZERO exchanges; results match plain join") {
    fixture

    // tiny test tables would broadcast (planner rightly prefers it and
    // disables bucketing); force the shuffle-join path a 100 TB fact-fact
    // join takes so the bucketed-no-exchange property is what's measured
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bo = Bucketing.readBucketed(spark, "bkt_orders")
      val bi = Bucketing.readBucketed(spark, "bkt_items")
      val joined = bo.join(bi, Seq("key"))
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use bucket metadata:\n$plan")

      // same multiset as the plain (shuffled) join of the raw frames
      assert(joined.count() == orders.join(items, Seq("key")).count())
      assert(joined.agg(sum(col("i_payload"))).as[Long].head() ==
        items.agg(sum(col("i_payload"))).as[Long].head())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("groupBy on the bucket key skips its shuffle") {
    fixture
    val agg = Bucketing.readBucketed(spark, "bkt_items")
      .groupBy("key").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
