#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just pre-verifies that
each SparkEntry.oracleSql matches the Spark result the way the driver
will: run graft.Verify first, then this against the same sfDir.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    """DataFrame -> (schema, sorted rows) with columns sorted by name."""
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    rows = sorted(map(tuple, df.astype(str).values.tolist()))
    return list(zip(df.columns, [str(t) for t in df.dtypes])), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_schema, got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            want_schema, want = canon(con.sql(sql))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got == want:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(got)} duck={len(want)}")
            print(f"  spark schema: {got_schema}\n  duck schema : {want_schema}")
            for i, (a, b) in enumerate(zip(got, want)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
