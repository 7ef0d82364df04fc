package graft.operators

import graft.SparkSpec
import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants for the merge/dedup/prefix-sum algebra —
  * randomized inputs catch the key-edge interactions (dup keys in both
  * frames, empty sides, single-key pileups) that example-based specs pin
  * one at a time. Generators run under FIXED seeds (no scalatestplus
  * bridge ships in the offline cache, and fixed seeds keep failures
  * reproducible); sample counts are small because every case spins real
  * Spark jobs. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(24), Seed(i.toLong)))

  private val rowsGen: Gen[List[(String, Double)]] =
    Gen.listOf(for {
      k <- Gen.oneOf((0 to 12).map(i => s"K$i"))
      v <- Gen.chooseNum(0.0, 100.0)
    } yield (k, v))

  private val pairGen: Gen[(List[(String, Double)], List[(String, Double)])] =
    Gen.zip(rowsGen, rowsGen)

  private def frame(rows: List[(String, Double)]): DataFrame =
    rows.toDF("ticker", "price").withColumn("row_hash",
      HashFns.canonicalRowHash(Seq(col("ticker")), Seq(col("price"))))

  private def canon(df: DataFrame): Seq[(String, Double)] =
    df.select("ticker", "price").as[(String, Double)].collect().toSeq.sorted

  test("merge is idempotent for ANY target/update pair (T3 at-least-once contract)") {
    samples(pairGen, 8).foreach { case (t, u) =>
      val target = frame(t).dropDuplicates("ticker")
      val updates = frame(u)
      val order = Seq(col("price").desc)
      val once = MergeSink.merge(target, updates, Seq("ticker"),
        updateOrder = order)
      val twice = MergeSink.merge(once, updates, Seq("ticker"),
        updateOrder = order)
      assert(canon(once) == canon(twice), s"target=$t updates=$u")
    }
  }

  test("merge emits every key exactly once: target ∪ update keys, no dups, no losses") {
    samples(pairGen, 8).foreach { case (t, u) =>
      val target = frame(t).dropDuplicates("ticker")
      val updates = frame(u)
      val out = MergeSink.merge(target, updates, Seq("ticker"),
        updateOrder = Seq(col("price").desc))
      val keys = out.select("ticker").as[String].collect().toSeq
      assert(keys.sorted == keys.distinct.sorted,
        s"duplicate keys in merge output: target=$t updates=$u")
      assert(keys.toSet == (t.map(_._1) ++ u.map(_._1)).toSet,
        s"key loss/invention: target=$t updates=$u")
    }
  }

  test("keyedKeepFirst survivor is the order-minimum of its key group, always") {
    samples(rowsGen.suchThat(_.nonEmpty), 8).foreach { rows =>
      val df = rows.toDF("ticker", "price")
      val got = Dedup.keyedKeepFirst(df, Seq("ticker"),
          Seq(col("price").asc, col("ticker").asc))
        .select("ticker", "price").as[(String, Double)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).min }
      assert(got == expected, s"rows=$rows")
    }
  }

  test("distributed prefix sum equals the serial window for ANY value sequence") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L)), 6).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(5)
      val naive = df.withColumn("cum",
          sum(col("v")).over(Window.orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("id").select("cum").as[Long].collect().toSeq
      val fast = PrefixSum.withRunningTotal(spark, df, "id", "v", "cum",
          numPartitions = 3)
        .orderBy("id").select("cum").as[Long].collect().toSeq
      assert(fast == naive, s"values=$vs")
    }
  }
}
