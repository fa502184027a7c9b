#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the same sf tables, and
compares: schema (sorted column names), row count, and a value hash over
rows sorted by all columns. Floats are rounded to 9 significant-ish
decimals before hashing to mimic a tolerant driver compare; exact matches
are reported separately so we know when we're relying on tolerance.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    exact = True
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af = a[c].astype(float).values
            bf = b[c].astype(float).values
            if not np.array_equal(af, bf, equal_nan=True):
                exact = False
                if not np.allclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True):
                    i = int(np.argmax(~np.isclose(af, bf, rtol=1e-9, atol=1e-12, equal_nan=True)))
                    return f"VALUE MISMATCH col={c} row={i} spark={af[i]!r} duck={bf[i]!r}"
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
    return "OK-exact" if exact else "OK-approx"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    passed = {}  # single source of truth for both the label and the count
    oracle_cache = {}  # SQL text -> DataFrame: shared oracles (e.g. the
    # exact-Jaccard self-join declared by BOTH q_minhash_lsh_neardup and
    # q_jaccard_prefix_join) execute ONCE per sweep instead of once per
    # declaring query — the sf0.1 sweep's dominant cost (round-12
    # verdict #3: ~42 min, quadratic-ish in sharers without this).
    # Only SQL declared by >1 query is cached (no memory cost for the
    # 200+ unique ones).
    from collections import Counter
    sql_counts = Counter(oracles.values())
    for qdir in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in glob.glob(f"{qdir}/*.parquet")],
            ignore_index=True) if glob.glob(f"{qdir}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            results[name] = f"no-oracle rows={len(spark_df)}"
            passed[name] = len(spark_df) > 0
            continue
        try:
            sql = oracles[name]
            if sql in oracle_cache:
                duck_df = oracle_cache[sql]
            else:
                duck_df = con.execute(sql).df()
                if sql_counts[sql] > 1:
                    oracle_cache[sql] = duck_df
        except Exception as e:
            results[name] = f"DUCKDB ERROR: {e}"
            passed[name] = False
            continue
        v = compare(name, spark_df, duck_df)
        results[name] = f"{v} rows={len(spark_df)}"
        passed[name] = v.startswith("OK")
    # A query whose dump Verify withdrew (the minDistinct vacuous-output
    # guard deletes the parquet dir on a floor violation) must FAIL the
    # gate, not silently shrink N/N: iterate the declared oracle names,
    # not just the dirs that happen to exist.
    for name in oracles:
        if name not in results:
            results[name] = "MISSING RESULT (no output dir — withdrawn " \
                "by Verify or never written)"
            passed[name] = False
    fails = sum(1 for ok in passed.values() if not ok)
    for k in sorted(results):
        print(f"{'PASS' if passed[k] else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
