#!/usr/bin/env python
"""Time every oracle SQL (from a Verify run's oracle_sql.json) in DuckDB
against a testdata dir. Two repetitions, min taken (the judge's re-time
shape). Prints one JSON object {query: sec, ..., "_total": sec}.

Robust at large scale factors: each query gets a FRESH connection with an
explicit memory limit and a spill directory, and a query that still fails
(e.g. the recursive-CTE reachability blowing past memory at sf5) is
recorded under "_failed" instead of aborting the whole run — an oracle
that cannot complete a query at a scale the engine handles is itself a
scaling datapoint. Progress goes to stderr per query so long runs are
observable."""
import os, sys, json, time
import duckdb

sfdir, oracle_json = sys.argv[1], sys.argv[2]
mem_limit = os.environ.get("DUCK_MEM_LIMIT", "100GB")
spill = os.environ.get("DUCK_TEMP_DIR", "/tmp/duckspill")
os.makedirs(spill, exist_ok=True)

oracle = json.load(open(oracle_json))
times = {}
failed = {}
import gc
for name in sorted(oracle):
    best = None
    err = None
    con = None
    try:
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{mem_limit}'")
        con.execute(f"SET temp_directory='{spill}'")
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = f"{sfdir}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        for _ in range(2):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
    finally:
        # ALWAYS release the connection — a failed query's connection
        # otherwise keeps its buffers alive and every later query dies
        # on tiny allocations (measured: one q61 OOM at sf5 cascaded
        # into 35 spurious failures)
        try:
            if con is not None:
                con.close()
        except Exception:
            pass
        del con
        gc.collect()
    if err is None:
        times[name] = round(best, 4)
        print(f"[oracle] {name} {times[name]}s", file=sys.stderr, flush=True)
    else:
        failed[name] = err.splitlines()[0][:200]
        print(f"[oracle] {name} FAILED {failed[name]}", file=sys.stderr, flush=True)
times["_total"] = round(sum(v for k, v in times.items() if k != "_total"), 3)
if failed:
    times["_failed"] = failed
print(json.dumps(times))
sys.exit(0)
