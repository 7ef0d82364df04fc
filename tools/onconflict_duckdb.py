#!/usr/bin/env python3
"""Execute the EXACT Postgres-dialect SQL that graft.sinks.JdbcUpsert
generates against DuckDB, which implements the PostgreSQL
`INSERT ... ON CONFLICT (key) DO UPDATE SET ... WHERE ...` form with
EXCLUDED scoping. Driven by JdbcUpsertSpec: the spec dumps the dialect's
generated statements to files and this script runs them through the
reference scenario (insert / hash-changed update / equal-hash no-op /
excluded-column preservation / staged merge idempotence), exiting
non-zero with a diagnostic on any divergence.

Usage: onconflict_duckdb.py <row_upsert.sql> <staged_merge.sql>
The staged merge SQL must reference staging table `tmp1`.
"""
import sys

import duckdb

row_sql = open(sys.argv[1]).read()
merge_sql = open(sys.argv[2]).read()

con = duckdb.connect()
con.execute(
    "CREATE TABLE master (ticker VARCHAR, name VARCHAR, row_hash VARCHAR, "
    "id INTEGER DEFAULT 7, created_at VARCHAR DEFAULT 'orig')")
# the ON CONFLICT target: the natural-key unique constraint
con.execute("CREATE UNIQUE INDEX master_pk ON master (ticker)")


def rows():
    return sorted(con.execute("SELECT * FROM master").fetchall())


def check(label, expect):
    got = rows()
    if got != expect:
        print(f"FAIL {label}: expected {expect}, got {got}")
        sys.exit(1)


# K3 per-row form: fresh key inserts
con.execute(row_sql, ["T1", "Fund One", "h1"])
check("insert", [("T1", "Fund One", "h1", 7, "orig")])

# conflicting key + CHANGED hash updates (id/created_at excluded from SET)
con.execute(row_sql, ["T1", "Fund One v2", "h2"])
check("update-on-hash-change", [("T1", "Fund One v2", "h2", 7, "orig")])

# conflicting key + EQUAL hash is a no-op (the IS DISTINCT FROM guard)
con.execute(row_sql, ["T1", "MUST NOT APPLY", "h2"])
check("noop-on-equal-hash", [("T1", "Fund One v2", "h2", 7, "orig")])

# NULL vs non-NULL hash counts as distinct (IS DISTINCT FROM, not <>)
con.execute(row_sql, ["T1", "Fund One v3", None])
check("null-hash-distinct", [("T1", "Fund One v3", None, 7, "orig")])

# K5 staged form: one set-based merge from the staging table
con.execute("CREATE TABLE tmp1 (ticker VARCHAR, name VARCHAR, row_hash VARCHAR)")
con.execute("INSERT INTO tmp1 VALUES ('T1','Fund One v4','h4'), ('T2','Fund Two','h9')")
con.execute(merge_sql)
check("staged-merge", [("T1", "Fund One v4", "h4", 7, "orig"),
                       ("T2", "Fund Two", "h9", 7, "orig")])

# replaying the identical staged batch is a value-level no-op
con.execute(merge_sql)
check("staged-merge-idempotent", [("T1", "Fund One v4", "h4", 7, "orig"),
                                  ("T2", "Fund Two", "h9", 7, "orig")])

print(f"ONCONFLICT_OK duckdb={duckdb.__version__}")
