#!/usr/bin/env python3
"""Self-check: replicate the driver's t2 gate locally.

Runs each oracle_sql.json query in DuckDB over the same sf dir and compares
with the Spark parquet output: columns sorted by name, rows sorted, values
compared (lists compared element-wise, floats exactly — both sides round).
Usage: check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

import numpy as np

def norm(v):
    if isinstance(v, np.ndarray): return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (np.floating,)): v = float(v)
    if isinstance(v, (np.integer,)): return int(v)
    if isinstance(v, (np.bool_,)): return bool(v)
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == 0: return 0.0
        if v == int(v): return float(v)
        return v
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

def list_cols(df):
    """The driver's pandas sort_values raises on list/ndarray cells — any
    list-typed output column is an automatic gate failure. Flag them."""
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(col.iloc[0], (list, tuple, np.ndarray)):
            bad.append(c)
    return bad

fails, okc = [], 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output missing: {e}")); continue
    lb = list_cols(exp) + list_cols(got)
    if lb:
        fails.append((name, f"list-typed columns (driver cannot hash): {sorted(set(lb))}")); continue
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        fails.append((name, f"columns differ: oracle={ec} spark={gc}")); continue
    # dtype-kind mismatch (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
    # hash-mismatches in the driver even when values are identical
    dk = [(c, exp[c].dtype, got[c].dtype) for c in ec
          if exp[c].dtype.kind != got[c].dtype.kind]
    if dk:
        fails.append((name, f"dtype kinds differ: {dk}")); continue
    er = sorted([tuple(norm(v) for v in row) for row in exp[ec].itertuples(index=False)], key=str)
    gr = sorted([tuple(norm(v) for v in row) for row in got[ec].itertuples(index=False)], key=str)
    if len(er) != len(gr):
        fails.append((name, f"row count: oracle={len(er)} spark={len(gr)}")); continue
    bad = [(a, b) for a, b in zip(er, gr) if a != b]
    if bad:
        fails.append((name, f"{len(bad)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}"))
    else:
        okc += 1
print(f"OK: {okc}/{len(oracle)}")
for name, msg in fails:
    print(f"FAIL {name}: {msg[:400]}")
