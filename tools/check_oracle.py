#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's check: run each oracle SQL in DuckDB over the same
parquet tables, compare schema + rows against the Spark result
(columns sorted by name, rows sorted by all columns, values compared
exactly after string normalization).
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        bad.append((name, "no spark output"))
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        duck_df = con.execute(sql).df()
    except Exception as e:
        bad.append((name, f"exec error: {e}"))
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        bad.append((name, f"columns differ: spark={sc} duck={dc}"))
        continue
    s = spark_df[sc].copy(); d = duck_df[sc].copy()
    if len(s) != len(d):
        bad.append((name, f"row count: spark={len(s)} duck={len(d)}"))
        continue
    # dtype comparison
    dt_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in sc
                   if str(s[c].dtype) != str(d[c].dtype)]
    # normalize and compare values
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s2, d2 = norm(s), norm(d)
    try:
        eq = s2.equals(d2)
        if not eq:
            diff_cols = [c for c in sc if not s2[c].equals(d2[c])]
            detail = []
            for c in diff_cols[:3]:
                neq = (s2[c] != d2[c])
                idx = neq[neq].index[:3]
                detail.append(f"{c}: " + "; ".join(
                    f"spark={s2[c][i]!r} duck={d2[c][i]!r}" for i in idx))
            bad.append((name, f"values differ in {diff_cols}: {detail}"))
            continue
    except Exception as e:
        bad.append((name, f"compare error: {e}"))
        continue
    tag = " [dtype!]" + str(dt_mismatch) if dt_mismatch else ""
    ok.append(name + tag)

print(f"== OK ({len(ok)}):")
for n in ok: print("  ", n)
print(f"== FAIL ({len(bad)}):")
for n, why in bad: print("  ", n, "->", why)
