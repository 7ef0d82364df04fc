package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("pos is a permutation of 0..n-1; shards are full except the last") {
    val df = spark.range(0, 1000).toDF("doc_id")
    val plan = Sharding.shardPlan(spark, df, "doc_id", shardSize = 64)
    val rows = plan.select("pos", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == (0L until 1000L))
    val byShard = rows.groupBy(_._2).view.mapValues(_.size).toMap
    // 1000 = 15 full shards of 64 + one of 40
    assert(byShard.size == 16)
    assert(byShard.filter(_._1 < 15).values.toSet == Set(64))
    assert(byShard(15L) == 40)
    // pos_in_shard consistent with pos
    assert(rows.forall { case (p, s, ps) => s == p / 64 && ps == p % 64 })
  }

  test("layout is a pure function of the id set: partitioning-independent " +
      "and re-run-identical (the restartability contract)") {
    val a = Sharding.shardPlan(spark,
        spark.range(0, 500).toDF("doc_id"), "doc_id", 32)
      .orderBy("doc_id").collect().toSeq
    val b = Sharding.shardPlan(spark,
        spark.range(0, 500).toDF("doc_id").repartition(13), "doc_id", 32)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("the permutation actually scatters adjacent ids (md5, not identity)") {
    val plan = Sharding.shardPlan(spark,
        spark.range(0, 256).toDF("doc_id"), "doc_id", 16)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    // consecutive ids landing in the same shard should be rare: count
    // adjacent pairs sharing a shard; identity layout would give ~240
    val same = (0L until 255L).count(i => plan(i) == plan(i + 1))
    assert(same < 40, s"adjacent ids co-sharded $same times — not shuffled")
  }

  test("writeShards round-trip: one directory per shard, rows in " +
      "permutation order, union equals the corpus") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val df = spark.range(0, 300).toDF("doc_id")
      .withColumn("payload", concat(lit("doc-"), col("doc_id")))
    Sharding.writeShards(spark, df, "doc_id", shardSize = 50, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 300)
    assert(back.select("doc_id").as[Long].collect().toSet == (0L until 300L).toSet)
    assert(back.select("shard_id").distinct().count() == 6)
    // within a shard file, row order follows pos_in_shard (writer sorted)
    val s0 = spark.read.parquet(s"$out/shard_id=0")
      .select("pos_in_shard").as[Long].collect().toSeq
    assert(s0 == s0.sorted, "shard rows not in permutation order")
  }

  test("writeShards on an EMPTY corpus: the directory still reads back " +
      "(zero rows, full schema) instead of UNABLE_TO_INFER_SCHEMA") {
    val out = java.nio.file.Files.createTempDirectory("shards_empty").toString
    val df = spark.range(0, 0).toDF("doc_id")
      .withColumn("payload", concat(lit("doc-"), col("doc_id")))
    Sharding.writeShards(spark, df, "doc_id", shardSize = 50, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 0)
    assert(Set("doc_id", "payload", "shard_id", "pos_in_shard", "pos")
      .subsetOf(back.columns.toSet), back.columns.mkString(","))
  }
}
