package graft.sinks

import java.sql.DriverManager
import java.util.Properties

import graft.SparkSpec
import graft.sinks.JdbcUpsert._

class JdbcUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val spec = UpsertSpec(
    table = "stg_price_history",
    keys = Seq("ticker", "asset_type", "source", "date"),
    hashCol = Some("row_hash"))

  private val cols = Seq("ticker", "asset_type", "source", "date",
    "close", "row_hash", "updated_at")

  // ------------------------------------------------------- SQL generation

  test("Postgres staged merge reproduces the reference's ON CONFLICT shape") {
    val sql = Postgres.stagedMergeSql(spec, "temp_stg_price_history_1", cols)
    // identifiers quoted case-exact: Spark's JDBC writer quotes the temp
    // table's columns, so unquoted names would be folded by Postgres
    assert(sql.contains("""INSERT INTO stg_price_history ("ticker", "asset_type", "source", "date", "close", "row_hash", "updated_at")"""))
    assert(sql.contains("""SELECT "ticker", "asset_type", "source", "date", "close", "row_hash", "updated_at" FROM temp_stg_price_history_1"""))
    assert(sql.contains("""ON CONFLICT ("ticker", "asset_type", "source", "date")"""))
    assert(sql.contains(""""close" = EXCLUDED."close""""))
    assert(sql.contains(""""row_hash" = EXCLUDED."row_hash""""))
    assert(sql.contains("""WHERE stg_price_history."row_hash" IS DISTINCT FROM EXCLUDED."row_hash""""))
    // keys are never in the SET list
    assert(!sql.contains(""""ticker" = EXCLUDED."ticker""""))
  }

  test("excludeFromUpdate columns stay out of the SET list (reference id/updated_at)") {
    val s = spec.copy(excludeFromUpdate = Seq("id", "updated_at"))
    val sql = Postgres.stagedMergeSql(s, "t", cols :+ "id")
    assert(sql.contains("""INSERT INTO stg_price_history ("ticker", "asset_type", "source", "date", "close", "row_hash", "updated_at", "id")"""))
    assert(!sql.contains(""""id" = EXCLUDED."id""""))
    assert(!sql.contains(""""updated_at" = EXCLUDED."updated_at""""))
  }

  test("no hash column -> unconditional DO UPDATE (K4 shape)") {
    val sql = Postgres.stagedMergeSql(spec.copy(hashCol = None), "t", cols)
    assert(!sql.contains("WHERE"))
    assert(sql.contains("DO UPDATE SET"))
  }

  test("Postgres row upsert is a parameterized single-row ON CONFLICT") {
    val sql = Postgres.rowUpsertSql(spec, cols).get
    assert(sql.contains("VALUES (?, ?, ?, ?, ?, ?, ?)"))
    assert(sql.contains("""ON CONFLICT ("ticker", "asset_type", "source", "date")"""))
    assert(sql.contains("""WHERE stg_price_history."row_hash" IS DISTINCT FROM EXCLUDED."row_hash""""))
  }

  test("AnsiMerge emits standard MERGE with null-safe hash guard") {
    val sql = AnsiMerge.stagedMergeSql(spec, "tmp", cols)
    assert(sql.contains("MERGE INTO stg_price_history t"))
    assert(sql.contains("USING tmp s"))
    assert(sql.contains("""ON t."ticker" = s."ticker" AND t."asset_type" = s."asset_type" AND t."source" = s."source" AND t."date" = s."date""""))
    assert(sql.contains("""WHEN MATCHED AND (t."row_hash" <> s."row_hash" OR (t."row_hash" IS NULL AND s."row_hash" IS NOT NULL) OR (t."row_hash" IS NOT NULL AND s."row_hash" IS NULL)) THEN UPDATE SET"""))
    assert(sql.contains("""WHEN NOT MATCHED THEN INSERT ("ticker", "asset_type", "source", "date", "close", "row_hash", "updated_at")"""))
  }

  // ----------------------------------------------------------- batching

  test("chunks honors the reference's chunksize contract") {
    val got = chunks((1 to 2503).iterator, 1000).map(_.size).toSeq
    assert(got == Seq(1000, 1000, 503))
    assert(chunks(Iterator.empty[Int], 1000).isEmpty)
    assert(chunks((1 to 5).iterator, 1000).toSeq == Seq(Seq(1, 2, 3, 4, 5)))
  }

  // ------------------------------------- end-to-end on embedded Derby

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new Properties()

  private def withDb[T](f: java.sql.Connection => T): T = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def queryAll(): Map[String, (Double, String)] = withDb { conn =>
    val rs = conn.createStatement()
      .executeQuery("""SELECT "ticker", "px", "row_hash" FROM prices ORDER BY "ticker"""")
    val b = Map.newBuilder[String, (Double, String)]
    while (rs.next()) b += rs.getString(1) -> ((rs.getDouble(2), rs.getString(3)))
    b.result()
  }

  test("upsertViaTemp against a real database: insert, hash-guarded update, no-op") {
    withDb { conn =>
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE prices") catch { case _: Exception => () }
      // case-exact quoted columns, as any Spark-created table carries
      st.executeUpdate(
        """CREATE TABLE prices (
          |  "ticker" VARCHAR(16) NOT NULL PRIMARY KEY,
          |  "px" DOUBLE,
          |  "row_hash" VARCHAR(64))""".stripMargin)
      st.executeUpdate("INSERT INTO prices VALUES ('AAA', 10.0, 'h-aaa-1')")
      st.executeUpdate("INSERT INTO prices VALUES ('BBB', 20.0, 'h-bbb-1')")
    }
    val s = UpsertSpec("prices", Seq("ticker"), Some("row_hash"), batchSize = 2)

    // AAA unchanged hash (value differs -> proves the guard, not the value,
    // decides); BBB changed hash; CCC new
    val updates = Seq(
      ("AAA", 99.0, "h-aaa-1"),
      ("BBB", 21.0, "h-bbb-2"),
      ("CCC", 30.0, "h-ccc-1")
    ).toDF("ticker", "px", "row_hash")

    JdbcUpsert.upsertViaTemp(updates, url, props, s, AnsiMerge)

    val after = queryAll()
    assert(after("AAA") == ((10.0, "h-aaa-1")), "identical hash must be a no-op")
    assert(after("BBB") == ((21.0, "h-bbb-2")), "changed hash must update")
    assert(after("CCC") == ((30.0, "h-ccc-1")), "new key must insert")

    // replay the same updates: idempotent (T3 at-least-once contract)
    JdbcUpsert.upsertViaTemp(updates, url, props, s, AnsiMerge)
    assert(queryAll() == after)

    // temp tables are dropped afterwards
    val leftover = withDb { conn =>
      val rs = conn.getMetaData.getTables(null, null, "TEMP_%", null)
      val names = Seq.newBuilder[String]
      while (rs.next()) names += rs.getString("TABLE_NAME")
      names.result()
    }
    assert(leftover.isEmpty, s"temp tables not dropped: $leftover")
  }

  test("upsertViaTemp without hash column updates unconditionally") {
    withDb { conn =>
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE plain") catch { case _: Exception => () }
      st.executeUpdate(
        """CREATE TABLE plain ("k" VARCHAR(8) NOT NULL PRIMARY KEY, "v" DOUBLE)""")
      st.executeUpdate("INSERT INTO plain VALUES ('a', 1.0)")
    }
    val s = UpsertSpec("plain", Seq("k"), hashCol = None)
    JdbcUpsert.upsertViaTemp(
      Seq(("a", 5.0), ("b", 2.0)).toDF("k", "v"), url, props, s, AnsiMerge)
    val got = withDb { conn =>
      val rs = conn.createStatement()
        .executeQuery("""SELECT "k", "v" FROM plain ORDER BY "k"""")
      val b = Seq.newBuilder[(String, Double)]
      while (rs.next()) b += ((rs.getString(1), rs.getDouble(2)))
      b.result()
    }
    assert(got == Seq(("a", 5.0), ("b", 2.0)))
  }

  test("Postgres staged merge matches the reference statement text exactly") {
    // pinned whole-string: the reference's INSERT ... SELECT ... ON
    // CONFLICT DO UPDATE SET ... WHERE shape (db_connector.py:403-417)
    val s = UpsertSpec("prices", Seq("ticker"), Some("row_hash"))
    val sql = Postgres.stagedMergeSql(s, "temp_prices_x", Seq("ticker", "px", "row_hash"))
    assert(sql ==
      """INSERT INTO prices ("ticker", "px", "row_hash")
        |SELECT "ticker", "px", "row_hash" FROM temp_prices_x
        |ON CONFLICT ("ticker")
        |DO UPDATE SET
        |  "px" = EXCLUDED."px",
        |  "row_hash" = EXCLUDED."row_hash"
        |WHERE prices."row_hash" IS DISTINCT FROM EXCLUDED."row_hash"""".stripMargin)
    val row = Postgres.rowUpsertSql(s, Seq("ticker", "px", "row_hash")).get
    assert(row ==
      """INSERT INTO prices ("ticker", "px", "row_hash")
        |VALUES (?, ?, ?)
        |ON CONFLICT ("ticker")
        |DO UPDATE SET
        |  "px" = EXCLUDED."px",
        |  "row_hash" = EXCLUDED."row_hash"
        |WHERE prices."row_hash" IS DISTINCT FROM EXCLUDED."row_hash"""".stripMargin)
  }

  test("upsertDirect drives per-partition prepared batches against a real database") {
    // InsertOnly is the one per-row statement Derby accepts, so this
    // exercises upsertDirect's actual machinery — partition fan-out, one
    // connection per partition, positional setObject binding (string,
    // double, timestamp), executeBatch at batchSize boundaries plus the
    // tail flush, commit — end-to-end. The Postgres ON CONFLICT text runs
    // through the same machinery and is text-pinned above.
    withDb { conn =>
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE applog") catch { case _: Exception => () }
      st.executeUpdate(
        """CREATE TABLE applog ("k" VARCHAR(16), "v" DOUBLE, "ts" TIMESTAMP)""")
    }
    val ts = java.sql.Timestamp.valueOf("2024-05-01 12:00:00")
    val rows = (1 to 7).map(i => (s"k$i", i * 1.5, ts))
    // batchSize=3 with 7 rows across 2 partitions: both the full-batch
    // flush path and the pending-tail flush path execute
    JdbcUpsert.upsertDirect(rows.toDF("k", "v", "ts").repartition(2),
      url, props, UpsertSpec("applog", Seq("k"), hashCol = None, batchSize = 3),
      InsertOnly)
    val got = withDb { conn =>
      val rs = conn.createStatement()
        .executeQuery("""SELECT "k", "v", "ts" FROM applog ORDER BY "k"""")
      val b = Seq.newBuilder[(String, Double, java.sql.Timestamp)]
      while (rs.next()) b += ((rs.getString(1), rs.getDouble(2), rs.getTimestamp(3)))
      b.result()
    }
    assert(got.map(_._1) == rows.map(_._1).sorted)
    assert(got.map(_._2).toSet == rows.map(_._2).toSet)
    assert(got.forall(_._3 == ts))
  }

  test("upsertViaTemp with InsertOnly appends through the staged path") {
    withDb { conn =>
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE appendlog") catch { case _: Exception => () }
      st.executeUpdate("""CREATE TABLE appendlog ("k" VARCHAR(8), "v" DOUBLE)""")
    }
    val s = UpsertSpec("appendlog", Seq("k"), hashCol = None)
    JdbcUpsert.upsertViaTemp(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"),
      url, props, s, InsertOnly)
    JdbcUpsert.upsertViaTemp(Seq(("c", 3.0)).toDF("k", "v"),
      url, props, s, InsertOnly)
    val n = withDb { conn =>
      val rs = conn.createStatement().executeQuery("SELECT COUNT(*) FROM appendlog")
      rs.next(); rs.getInt(1)
    }
    assert(n == 3)
  }

  test("upsertDirect refuses dialects without a single-row form") {
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertDirect(
        Seq(("a", 1.0)).toDF("k", "v"), url, props,
        UpsertSpec("plain", Seq("k")), AnsiMerge)
    }
  }

  // --------------------------------------------- ON CONFLICT execution

  test("Postgres-dialect ON CONFLICT SQL EXECUTES on a PG-compatible engine " +
       "(DuckDB): insert / hash-guarded update / no-op / staged merge") {
    // No Postgres or H2 jar ships in this sandbox, but DuckDB (the oracle
    // engine) implements the PostgreSQL `ON CONFLICT (key) DO UPDATE SET
    // ... WHERE ...` form with EXCLUDED scoping. This test takes the
    // dialect's GENERATED statement text — the same strings upsertDirect
    // prepares and upsertViaTemp executes — and runs the reference
    // scenario through tools/onconflict_duckdb.py: type mapping, EXCLUDED
    // scoping, the IS DISTINCT FROM guard (incl. NULL hash), excluded-
    // column preservation, and staged-merge idempotence are all checked
    // by EXECUTION, not text equality.
    val have = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(have, "python3+duckdb not available in this environment")

    val pgSpec = UpsertSpec(table = "master", keys = Seq("ticker"),
      hashCol = Some("row_hash"))
    val pgCols = Seq("ticker", "name", "row_hash")
    val dir = java.nio.file.Files.createTempDirectory("onconflict")
    val rowSql = dir.resolve("row_upsert.sql")
    val mergeSql = dir.resolve("staged_merge.sql")
    java.nio.file.Files.writeString(rowSql,
      Postgres.rowUpsertSql(pgSpec, pgCols).get)
    java.nio.file.Files.writeString(mergeSql,
      Postgres.stagedMergeSql(pgSpec, "tmp1", pgCols))

    val p = new ProcessBuilder("python3", "tools/onconflict_duckdb.py",
        rowSql.toString, mergeSql.toString)
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
    val rc = p.waitFor()
    info(out.trim)
    assert(rc == 0 && out.contains("ONCONFLICT_OK"),
      s"ON CONFLICT execution diverged (rc=$rc):\n$out")
  }

  test("ON CONFLICT ON CONSTRAINT golden (reference db_connector.py:400-406) " +
       "and column-list equivalence") {
    // The reference addresses the arbiter BY NAME (constraint_map ->
    // `uq_stg_price_key`). PostgreSQL treats the named form and the
    // column-list form as the same arbiter whenever the constraint covers
    // the key columns, so graft defaults to the portable column list and
    // emits the named spelling only when UpsertSpec carries it.
    val named = spec.copy(constraintName = Some("uq_stg_price_key"))
    val sql = Postgres.stagedMergeSql(named, "temp_stg_price_history_1", cols)
    // exact-text golden of the full conflict clause, reference spelling
    assert(sql.contains("ON CONFLICT ON CONSTRAINT \"uq_stg_price_key\"\nDO UPDATE SET"),
      s"named-constraint clause wrong:\n$sql")
    assert(!sql.contains("""ON CONFLICT ("ticker""""))
    // equivalence: the two forms differ ONLY in the conflict target — SET
    // list, hash guard and INSERT text are byte-identical
    val columnForm = Postgres.stagedMergeSql(spec, "temp_stg_price_history_1", cols)
    assert(sql.replace("ON CONSTRAINT \"uq_stg_price_key\"",
        """("ticker", "asset_type", "source", "date")""") == columnForm)
    val namedRow = Postgres.rowUpsertSql(named, cols).get
    assert(namedRow.contains("ON CONFLICT ON CONSTRAINT \"uq_stg_price_key\""))

    // Executable documentation of why the EXECUTION gate runs the column
    // form: DuckDB's PG-compatible ON CONFLICT does not implement the
    // named-constraint spelling — it must fail to parse, while the column
    // form of the SAME spec executes green (the test above). A real
    // PostgreSQL would accept both against the same unique index.
    val have = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(have, "python3+duckdb not available in this environment")
    val probe =
      """import duckdb, sys
        |con = duckdb.connect()
        |con.execute("CREATE TABLE t (k VARCHAR, v VARCHAR)")
        |con.execute("CREATE UNIQUE INDEX uq_k ON t (k)")
        |try:
        |    con.execute("INSERT INTO t VALUES (?, ?) ON CONFLICT ON CONSTRAINT uq_k DO UPDATE SET v = EXCLUDED.v", ["a", "b"])
        |    print("UNEXPECTEDLY_PARSED"); sys.exit(1)
        |except duckdb.Error as e:
        |    print("NAMED_FORM_UNSUPPORTED_AS_DOCUMENTED")
        |""".stripMargin
    val p = new ProcessBuilder("python3", "-c", probe)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8").mkString
    assert(p.waitFor() == 0 && out.contains("NAMED_FORM_UNSUPPORTED_AS_DOCUMENTED"),
      s"DuckDB named-form probe: $out")
  }
}
