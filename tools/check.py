#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with the sf tables registered under
bare names, and compares — like the driver — through pandas frames with
columns sorted by name: per-column DTYPES must match (this is what the
repr-based round-4 version missed: DuckDB HUGEINT becomes float64 in pandas
and the driver's hash diverges even when values are identical), then row
values. Also audits every oracle's DESCRIBE output: a final schema containing
HUGEINT or DECIMAL is an automatic FAIL, because pandas cannot represent
either losslessly and the driver compare will mismatch Spark's BIGINT/DOUBLE.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD_ORACLE_TYPES = ("HUGEINT", "DECIMAL")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return repr(v)


def frame(rel):
    """DuckDB relation -> pandas frame with columns sorted by name,
    mirroring the driver's compare path."""
    df = rel.df()
    # duplicate column names would make df[sorted(...)] silently fan out
    # into repeated columns and surface as a baffling dtype/row diff —
    # fail loudly (a raise, not an assert: asserts vanish under -O)
    if len(set(df.columns)) != len(df.columns):
        raise ValueError(f"duplicate column names in result: {sorted(df.columns)}")
    return df[sorted(df.columns)]


def kind(t):
    """Driver-equivalent dtype class: pandas' hash_pandas_object upcasts
    every integer width (and bool) to uint64 before hashing, so int32 vs
    int64 hashes EQUAL, while int vs float diverges (float64 hashes its bit
    pattern). Mirror that: compare the kind, not the width."""
    k = t.kind
    return "i" if k in "iub" else k


def sig(df):
    """(columns, dtype kinds, sorted normalized rows) — the
    driver-equivalent comparison signature."""
    cols = list(df.columns)
    dtypes = [kind(t) for t in df.dtypes]
    rows = sorted(tuple(norm(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return cols, dtypes, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # Schema audit first: no oracle may emit HUGEINT/DECIMAL.
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
            bad = [(c, t) for c, t, *_ in desc
                   if any(b in t.upper() for b in BAD_ORACLE_TYPES)]
            if bad:
                print(f"FAIL {name}: oracle schema has pandas-lossy types "
                      f"{bad} — wrap in CAST(... AS BIGINT/DOUBLE)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        try:
            got = frame(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
            gcols, gtypes, grows = sig(got)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = frame(con.sql(sql))
            ecols, etypes, erows = sig(exp)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} != {ecols}")
            n_fail += 1
        elif gtypes != etypes:
            diff = [(c, g, e) for c, g, e in zip(gcols, gtypes, etypes)
                    if g != e]
            print(f"FAIL {name}: dtype mismatch (col, spark, oracle): {diff}")
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
