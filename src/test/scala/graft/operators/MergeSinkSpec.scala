package graft.operators

import graft.SparkSpec
import graft.functions.HashFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withHash(df: DataFrame): DataFrame =
    df.withColumn("row_hash",
      HashFns.canonicalRowHash(Seq(col("ticker")), Seq(col("price"))))

  private lazy val target = withHash(Seq(
    ("AAA", 10.0), ("BBB", 20.0), ("CCC", 30.0)).toDF("ticker", "price"))

  test("merge: unchanged rows no-op, changed rows update, new rows insert") {
    val updates = withHash(Seq(
      ("AAA", 10.0),   // identical -> no-op
      ("BBB", 21.0),   // changed   -> update
      ("DDD", 40.0)    // new       -> insert
    ).toDF("ticker", "price"))
    val out = MergeSink.merge(target, updates, Seq("ticker"))
      .orderBy("ticker").as[(String, Double, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq(("AAA", 10.0), ("BBB", 21.0), ("CCC", 30.0), ("DDD", 40.0)))
  }

  test("merge is idempotent: re-applying the same updates changes nothing") {
    val updates = withHash(Seq(("BBB", 21.0), ("DDD", 40.0)).toDF("ticker", "price"))
    val once  = MergeSink.merge(target, updates, Seq("ticker"))
    val twice = MergeSink.merge(once, updates, Seq("ticker"))
    assert(once.orderBy("ticker").collect().toSeq ==
      twice.orderBy("ticker").collect().toSeq)
  }

  test("merge without hash column updates unconditionally (K4 shape)") {
    val noHash = Seq(("AAA", 10.0), ("BBB", 20.0)).toDF("ticker", "price")
    val updates = Seq(("AAA", 99.0)).toDF("ticker", "price")
    val out = MergeSink.merge(noHash, updates, Seq("ticker"), hashCol = None)
      .orderBy("ticker").as[(String, Double)].collect().toSeq
    assert(out == Seq(("AAA", 99.0), ("BBB", 20.0)))
  }

  test("merge dedups update batch deterministically by updateOrder") {
    val updates = withHash(Seq(
      ("AAA", 1.0), ("AAA", 2.0)).toDF("ticker", "price"))
    val out = MergeSink.merge(target, updates, Seq("ticker"),
        updateOrder = Seq(col("price").desc))
      .filter(col("ticker") === "AAA").as[(String, Double, String)].head()
    assert(out._2 == 2.0) // keep-first by price desc = highest price wins
  }

  test("upsertParquet: create, re-apply (idempotent), update+insert, atomic swap") {
    val dir = java.nio.file.Files.createTempDirectory("merge_sink").toString
    val path = s"$dir/warehouse"
    val b1 = withHash(Seq(("AAA", 10.0), ("BBB", 20.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b1, Seq("ticker"))
    assert(MergeSink.readTable(spark, path).count() == 2)

    MergeSink.upsertParquet(spark, path, b1, Seq("ticker")) // replay
    assert(MergeSink.readTable(spark, path).count() == 2)

    val b2 = withHash(Seq(("BBB", 21.0), ("CCC", 30.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b2, Seq("ticker"))
    val rows = MergeSink.readTable(spark, path).orderBy("ticker")
      .as[(String, Double, String)].collect().toSeq.map(r => (r._1, r._2))
    assert(rows == Seq(("AAA", 10.0), ("BBB", 21.0), ("CCC", 30.0)))
  }

  /** File listing (relative path -> length) of every data file under dir. */
  private def dataFiles(path: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(path)
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
      .toMap
    finally s.close()
  }

  test("an EMPTY first upsert does not brick the table: dir reads back, " +
      "the first real upsert migrates it to the bucketed layout") {
    val dir = java.nio.file.Files.createTempDirectory("merge_empty").toString
    val path = s"$dir/warehouse"
    val none = withHash(Seq.empty[(String, Double)].toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, none, Seq("ticker"))
    // dir exists with schema, zero rows — NOT a fileless unreadable stub
    assert(MergeSink.readTable(spark, path).count() == 0)
    MergeSink.upsertParquet(spark, path, none, Seq("ticker")) // replay empty
    assert(MergeSink.readTable(spark, path).count() == 0)

    val b1 = withHash(Seq(("AAA", 10.0), ("BBB", 20.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b1, Seq("ticker"))
    assert(MergeSink.readTable(spark, path).orderBy("ticker")
      .as[(String, Double, String)].collect().toSeq.map(r => (r._1, r._2))
      == Seq(("AAA", 10.0), ("BBB", 20.0)))
    // migration landed the bucketed layout (partition dirs present), so
    // later upserts take the touched-buckets fast path
    assert(new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("__bucket=")))
    val b2 = withHash(Seq(("BBB", 21.0)).toDF("ticker", "price"))
    MergeSink.upsertParquet(spark, path, b2, Seq("ticker"))
    assert(MergeSink.readTable(spark, path).filter(col("ticker") === "BBB")
      .as[(String, Double, String)].head()._2 == 21.0)
  }

  test("bucketed upsert touching 1 key rewrites ONLY that key's bucket dir") {
    val dir = java.nio.file.Files.createTempDirectory("merge_bucket").toString
    val path = s"$dir/warehouse"
    // enough keys to populate several buckets
    val keys = (0 until 64).map(i => (f"TICK$i%03d", i.toDouble))
    MergeSink.upsertParquet(spark, path,
      withHash(keys.toDF("ticker", "price")), Seq("ticker"), numBuckets = 8)
    val before = dataFiles(path)
    assert(before.keys.map(_.split("/")(0)).toSet.size > 2) // several buckets

    // single-key update
    MergeSink.upsertParquet(spark, path,
      withHash(Seq(("TICK001", 999.0)).toDF("ticker", "price")), Seq("ticker"))
    val after = dataFiles(path)

    val changedBuckets = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .map(_.split("/")(0))
    assert(changedBuckets.size == 1, s"expected 1 rewritten bucket, got $changedBuckets")
    // value actually updated, untouched rows intact
    val rows = MergeSink.readTable(spark, path)
    assert(rows.filter(col("ticker") === "TICK001")
      .select("price").as[Double].head() == 999.0)
    assert(rows.count() == 64)
  }

  test("recoverSwap heals an interrupted bucket swap (staged dir rolls forward)") {
    val dir = java.nio.file.Files.createTempDirectory("merge_recover").toString
    val path = s"$dir/warehouse"
    MergeSink.upsertParquet(spark, path,
      withHash(Seq(("AAA", 1.0), ("BBB", 2.0)).toDF("ticker", "price")),
      Seq("ticker"), numBuckets = 4)

    // simulate a crash mid-swap: stage a new generation of one bucket dir,
    // move the live dir away, write the marker, and "crash" before renaming
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val bucketDir = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("__bucket=")).head.getName
    val cur = new org.apache.hadoop.fs.Path(path, bucketDir)
    val stg = new org.apache.hadoop.fs.Path(path + "__tmp", bucketDir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + "__tmp"))
    fs.rename(cur, stg) // staged generation exists, live dir gone
    val m = fs.create(new org.apache.hadoop.fs.Path(path + "__swap"), true)
    m.write(bucketDir.getBytes("UTF-8")); m.close()

    assert(MergeSink.recoverSwap(spark, path)) // heals
    assert(MergeSink.readTable(spark, path).count() == 2) // nothing lost
    assert(!new java.io.File(path + "__swap").exists())
    assert(!new java.io.File(path + "__tmp").exists())
  }

  test("recoverSwap heals an interrupted WHOLE-TABLE swap (root marker sentinel)") {
    // regression: the root swap's subdir is "", which serialized to an
    // EMPTY marker — recovery parsed zero entries and deleted both the
    // backup and the staged generation (total table loss)
    val dir = java.nio.file.Files.createTempDirectory("merge_root_recover").toString
    val path = s"$dir/table"
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // stage a new generation and simulate the crash window: live dir
    // parked under __old, staged dir not yet renamed in, marker present
    withHash(Seq(("AAA", 1.0)).toDF("ticker", "price"))
      .write.parquet(path + "__tmp")
    withHash(Seq(("OLD", 9.0)).toDF("ticker", "price"))
      .write.parquet(path + "__old/__root")
    val m = fs.create(new org.apache.hadoop.fs.Path(path + "__swap"), true)
    m.write(".".getBytes("UTF-8")); m.close()

    assert(MergeSink.recoverSwap(spark, path))
    // the staged generation rolled FORWARD — the table exists and is the
    // new data, not lost and not the old generation
    val rows = spark.read.parquet(path).select("ticker").as[String].collect().toSeq
    assert(rows == Seq("AAA"))
    assert(!new java.io.File(path + "__swap").exists())
    assert(!new java.io.File(path + "__old").exists())
    assert(!new java.io.File(path + "__tmp").exists())
  }

  test("writer lock: a second writer is rejected while the first holds the table") {
    val path = java.nio.file.Files.createTempDirectory("locktbl").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = withHash(Seq(("A", 1.0)).toDF("ticker", "price"))
    MergeSink.withTableLock(fs, path) { _ =>
      val e = intercept[MergeSink.ConcurrentWriteException] {
        MergeSink.upsertParquet(spark, path, df, Seq("ticker"))
      }
      assert(e.getMessage.contains("locked by another writer"))
    }
    // lock released -> the same upsert now succeeds, and releases again
    MergeSink.upsertParquet(spark, path, df, Seq("ticker"))
    assert(MergeSink.readTable(spark, path).count() == 1)
    assert(!new java.io.File(path + "__lock").exists())
  }

  test("writer lock: a stale lock from a dead writer is broken, not honored") {
    val path = java.nio.file.Files.createTempDirectory("staletbl").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(path + "__lock")
    val out = fs.create(lock, false)
    out.write("dead-writer".getBytes("UTF-8")); out.close()
    // age the lock past the stale horizon
    fs.setTimes(lock, System.currentTimeMillis() - 60 * 60 * 1000L, -1)
    MergeSink.upsertParquet(spark, path,
      withHash(Seq(("A", 1.0)).toDF("ticker", "price")), Seq("ticker"))
    assert(MergeSink.readTable(spark, path).count() == 1)
    assert(!new java.io.File(path + "__lock").exists())
  }

  test("writer lock: heartbeat keeps a slow-but-alive writer's lock fresh " +
       "past the stale horizon") {
    val path = java.nio.file.Files.createTempDirectory("hbtbl").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // writer A holds with a 400 ms stale horizon and a live heartbeat;
    // writer B probes AFTER that horizon has elapsed — the heartbeat must
    // have re-touched the mtime, so B sees a FRESH lock and is rejected
    MergeSink.withTableLock(fs, path, staleAfterMs = 400L) { _ =>
      Thread.sleep(900L) // overrun the horizon while alive
      intercept[MergeSink.ConcurrentWriteException] {
        MergeSink.withTableLock(fs, path, staleAfterMs = 400L) { _ => () }
      }
    }
    assert(!new java.io.File(path + "__lock").exists())
  }

  test("writer lock: an overrunning writer whose lock was stale-broken " +
       "aborts before its swap — exactly one swap wins") {
    val path = java.nio.file.Files.createTempDirectory("racetbl").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dfB = withHash(Seq(("B", 2.0)).toDF("ticker", "price"))
    // writer A: heartbeat suppressed (simulates a heartbeat outage /
    // pre-fix writer); aging the lock below stands in for A overrunning
    // the real 30-minute horizon mid-merge
    val e = intercept[MergeSink.LockLostException] {
      MergeSink.withTableLock(fs, path,
                              heartbeatMs = Long.MaxValue) { lockA =>
        fs.setTimes(new org.apache.hadoop.fs.Path(path + "__lock"),
                    System.currentTimeMillis() - 60 * 60 * 1000L, -1)
        // writer B judges A stale, breaks the lock, and completes its upsert
        MergeSink.upsertParquet(spark, path, dfB, Seq("ticker"))
        // A now reaches its own swap: the pre-swap ownership re-check must
        // abort it — B's swap already won
        lockA.assertOwned()
      }
    }
    assert(e.getMessage.contains("lost to another writer"))
    // the table is B's generation, intact — A corrupted nothing
    val rows = MergeSink.readTable(spark, path)
      .select("ticker").as[String].collect().toSeq
    assert(rows == Seq("B"))
  }

  test("writer lock: lock failures release the lock (finally path)") {
    val path = java.nio.file.Files.createTempDirectory("failtbl").toString + "/t"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    intercept[RuntimeException] {
      MergeSink.withTableLock(fs, path) { _ => throw new RuntimeException("boom") }
    }
    assert(!new java.io.File(path + "__lock").exists())
  }

  test("delta MERGE profile: golden SQL always; execution when the jar ships") {
    val sql = MergeSink.deltaMergeSql("/wh/master", "upd", Seq("ticker", "date"))
    assert(sql ==
      """MERGE INTO delta.`/wh/master` t
        |USING upd u
        |ON t.`ticker` <=> u.`ticker` AND t.`date` <=> u.`date`
        |WHEN MATCHED AND NOT (t.`row_hash` <=> u.`row_hash`) THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // no hash guard -> unconditional K4 form
    assert(MergeSink.deltaMergeSql("/wh/m", "u1", Seq("k"), None)
      .contains("WHEN MATCHED THEN UPDATE SET *"))
    // upsertAuto routes to the parquet swap-sink when Delta is absent
    // (this sandbox), to MERGE INTO when present (asserted only then)
    if (!MergeSink.deltaAvailable) {
      val path = java.nio.file.Files.createTempDirectory("autotbl").toString + "/t"
      val df = withHash(Seq(("A", 1.0)).toDF("ticker", "price"))
      MergeSink.upsertAuto(spark, path, df, Seq("ticker"))
      assert(MergeSink.readTable(spark, path).count() == 1)
    } else {
      cancel("Delta on classpath: exercise the MERGE INTO execution path")
    }
  }

  test("applyStatusLifecycle: aging to inactive, new+named to active") {
    val master = Seq(
      ("T1", "2024-01-01", "active", "Fund One"),   // stale -> inactive
      ("T2", "2024-05-01", "new", "Fund Two"),      // fresh new + name -> active
      ("T3", "2024-05-01", "new", ""),              // no name -> stays new
      ("T4", "2024-05-01", "active", "Fund Four")   // fresh -> unchanged
    ).toDF("ticker", "last_seen", "status", "name")
      .withColumn("last_seen", col("last_seen").cast("date"))
    val out = MergeSink.applyStatusLifecycle(master,
        lit("2024-05-02").cast("date"), inactiveDays = 7)
      .orderBy("ticker").select("status").as[String].collect().toSeq
    assert(out == Seq("inactive", "active", "new", "active"))
  }
}
