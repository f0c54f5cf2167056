#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sf tables registered under
bare names, and compares row sets (columns sorted by name, rows sorted).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = sorted(got.columns)
            grows = sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(gcols)} FROM got").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            ecols = sorted(exp.columns)
            erows = sorted(
                tuple(norm(v) for v in row)
                for row in con.sql(
                    f"SELECT {', '.join(ecols)} FROM exp").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} != {ecols}")
            n_fail += 1
        elif grows != erows:
            print(f"FAIL {name}: rows {len(grows)} vs {len(erows)}")
            both = set(grows) & set(erows)
            for r in [r for r in grows if r not in both][:3]:
                print(f"  spark-only: {r}")
            for r in [r for r in erows if r not in both][:3]:
                print(f"  oracle-only: {r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
