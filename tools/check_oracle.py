#!/usr/bin/env python
"""Local replica of the driver's t2 gate: compare Verify output parquet
against DuckDB oracle results (row count, sorted-column value hash)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("int64")
    try:
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        print(f"MISS  {name}: no spark output"); fails.append(name); continue
    try:
        got = canon(pd.read_parquet(pq))
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"ERR   {name}: {e}"); fails.append(name); continue
    if list(got.columns) != list(want.columns):
        print(f"COLS  {name}: spark={list(got.columns)} duck={list(want.columns)}"); fails.append(name); continue
    if len(got) != len(want):
        print(f"ROWS  {name}: spark={len(got)} duck={len(want)}"); fails.append(name); continue
    ok = True
    for c in got.columns:
        g, w = got[c], want[c]
        # The driver's value hash is dtype-sensitive: an int64 Spark column
        # vs a float64 oracle column (DuckDB HUGEINT -> pandas float64, the
        # q121 failure) hash-diverges even when every value is equal. Treat
        # any int-vs-float dtype split as a failure, not a coercion.
        g_f, w_f = np.issubdtype(g.dtype, np.floating), np.issubdtype(w.dtype, np.floating)
        if g_f != w_f:
            print(f"DTYPE {name}.{c}: spark={g.dtype} duck={w.dtype} (driver hash would diverge)")
            ok = False
            continue
        if g_f or w_f:
            eq = np.array_equal(np.asarray(g, dtype=float), np.asarray(w, dtype=float), equal_nan=True)
        else:
            eq = (g.fillna("<N>").astype(str) == w.fillna("<N>").astype(str)).all()
        if not eq:
            mism = (g.astype(str) != w.astype(str))
            idx = mism[mism].index[:3]
            print(f"VALS  {name}.{c}: first diffs {[(g[i], w[i]) for i in idx]}")
            ok = False
    if ok:
        print(f"OK    {name} ({len(got)} rows)")
    else:
        fails.append(name)
for pq in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(pq)
    if name not in oracle and os.path.isdir(pq):
        n = len(pd.read_parquet(pq))
        print(f"{'OK-RO' if n>0 else 'EMPTY'} {name} ({n} rows)")
        if n == 0: fails.append(name)
print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL GREEN")
sys.exit(1 if fails else 0)
