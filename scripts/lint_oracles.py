#!/usr/bin/env python3
"""Oracle type lint (driver-side tooling, not part of the library).

Usage: python3 scripts/lint_oracles.py <oracle_sql.json> <sf_dir>

DESCRIBEs every oracle query in DuckDB over the testdata parquet views and
fails if any result column has a type the driver's hasher aliases differently
from the Spark side at equal values (HUGEINT and the unsigned integer family).
This class of false-fail bit in rounds 1 AND 4 (q82/q89/q92: uncasted integer
sum() -> HUGEINT); the lint makes it impossible to ship again.
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def main():
    sql_json, sfdir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(sql_json))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, f"DESCRIBE failed: {e}"))
            continue
        for row in desc:
            col, typ = row[0], str(row[1]).upper()
            if any(b in typ for b in BANNED):
                bad.append((name, f"column '{col}' has banned type {typ} "
                                  f"(cast to ::BIGINT / ::DOUBLE in the oracle)"))
    if bad:
        for name, msg in bad:
            print(f"ORACLE-LINT FAIL {name}: {msg}")
        sys.exit(1)
    print(f"ORACLE-LINT OK: {len(oracles)} oracles, no banned column types")


if __name__ == "__main__":
    main()
