#!/usr/bin/env python3
"""Dev-only pre-check of SparkEntry oracles (simulates the driver's t2 gate):
reads each Verify output parquet, runs the paired DuckDB oracle SQL over the
same sf tables, and compares row sets with columns sorted by name.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# ORACLE_MEMLIMIT=64GB — cap DuckDB below its 80%-of-RAM default when the
# scaled-data replay must coexist with anything else (the unbounded default
# got the whole process OOM-killed at sf1 next to a 48g Spark driver)
if os.environ.get("ORACLE_MEMLIMIT"):
    con.execute(f"SET memory_limit='{os.environ['ORACLE_MEMLIMIT']}'")
    con.execute(f"SET temp_directory='{outdir}/duckdb_spill'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # Spark-written tables (e.g. the ScaleUp sf1 set) are directories of part files.
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    sel = "*"
    if t == "events":
        # ScaleUp writes ts as BIGINT nanos (round-trips identically on the
        # Spark side); normalize to TIMESTAMP so the oracle SQL's time
        # functions work on both layouts.
        # probe the column TYPE, not a row: an empty events table would
        # make fetchone() return None and abort the whole oracle run
        row = con.execute(f"DESCRIBE SELECT ts FROM '{src}'").fetchone()
        if row is not None and row[1] == "BIGINT":
            sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
    con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns, key=str.lower)]
    # normalize types: ints -> int64, floats -> rounded float, ts -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
        out[c.lower()] = s
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)

# ORACLE_SKIP=a,b — for scaled-data runs: skip oracles that are
# intentionally brute-force/quadratic (exact all-pairs Jaccard) and only
# tractable at the sf0.01 gate scale. Reported separately, not as PASS.
skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
# ORACLE_ONLY=a,b — check just the named queries (targeted re-checks at
# scaled data where the full DuckDB replay takes ~45 min).
only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))

fails, passes, noracle, skipped = [], [], [], []
for d in sorted(glob.glob(f"{outdir}/*")):
    name = os.path.basename(d)
    if not os.path.isdir(d):
        continue
    if only and name not in only:
        continue
    if name in skip:
        skipped.append(name)
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        noracle.append((name, len(spark_df)))
        continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"))
    elif len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
    elif not a.equals(b):
        diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
        nbad = diff_mask.any(axis=1).sum()
        i = diff_mask.any(axis=1).idxmax()
        fails.append((name, f"{nbad} differing rows; first at {i}:\n  spark: {a.iloc[i].to_dict()}\n  oracle: {b.iloc[i].to_dict()}"))
    else:
        passes.append((name, len(a)))

print(f"PASS ({len(passes)}):")
for n, r in passes: print(f"  {n} ({r} rows)")
print(f"ROWS-ONLY ({len(noracle)}):")
for n, r in noracle: print(f"  {n} ({r} rows)")
if skipped:
    print(f"SKIPPED ({len(skipped)}): {', '.join(sorted(skipped))}")
print(f"FAIL ({len(fails)}):")
for n, msg in fails: print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
