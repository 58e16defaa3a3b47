#!/usr/bin/env python3
"""Compare ONE query dumped by graft.ScratchQ against its oracle SQL.

Usage: python3 scripts/oracle_check_one.py <sfDir> <outDir> <name>
"""
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rel):
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    rows = sorted(map(tuple, df.astype(str).values.tolist()))
    return list(zip(df.columns, [str(t) for t in df.dtypes])), rows


def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = open(f"{out_dir}/oracle.sql").read()
    got_schema, got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
    want_schema, want = canon(con.sql(sql))
    if [c for c, _ in got_schema] != [c for c, _ in want_schema]:
        print(f"FAIL {name}: columns {got_schema} vs {want_schema}")
        return 1
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        return 1
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        return 1
    print(f"PASS {name} ({len(got)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
