#!/usr/bin/env python
"""Time every oracle SQL (from a Verify run's oracle_sql.json) in DuckDB
against a testdata dir. Two repetitions, min taken (the judge's re-time
shape). Prints one JSON object {query: sec, ..., "_total": sec}.

Robust at large scale factors: each query runs in its OWN forked
subprocess with a fresh connection, an explicit memory limit, and a
spill directory. Process isolation is the point — a query that OOMs at
sf5 leaves the parent untouched, where a single long-lived process never
returns the fragmented arenas to the OS and every later query then dies
on kilobyte allocations (measured: one q60 OOM cascaded into 35 spurious
failures twice, with and without connection close). A genuinely failing
query is recorded under "_failed" instead of aborting the run — an
oracle that cannot complete a query at a scale the engine handles is
itself a scaling datapoint. Progress goes to stderr per query.

Optional third arg: comma-separated query names to (re)time only those.
A subset run MERGES into an existing results file when the optional
fourth arg names one (other queries' timings are preserved and _total is
recomputed over the merged map); without a merge target the subset output
is labeled "_partial" so it cannot be mistaken for a full run.
"""
import os, sys, json, time
import multiprocessing as mp


def run_one(sfdir, sql, mem_limit, spill, q):
    try:
        import duckdb
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{mem_limit}'")
        con.execute(f"SET temp_directory='{spill}'")
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = f"{sfdir}/{t}.parquet"
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        best = None
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        q.put(("ok", best))
    except Exception as e:
        q.put(("err", f"{type(e).__name__}: {e}"))


def main():
    sfdir, oracle_json = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    mem_limit = os.environ.get("DUCK_MEM_LIMIT", "100GB")
    spill = os.environ.get("DUCK_TEMP_DIR", "/tmp/duckspill")
    os.makedirs(spill, exist_ok=True)

    oracle = json.load(open(oracle_json))
    times = {}
    failed = {}
    ctx = mp.get_context("fork")
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        q = ctx.Queue()
        p = ctx.Process(target=run_one,
                        args=(sfdir, oracle[name], mem_limit, spill, q))
        p.start()
        status, payload = None, None
        # hard per-query wall bound (both reps together): an oracle that
        # cannot finish inside it at a scale the engine handles is itself
        # the datapoint — recorded under _failed, never an unbounded hang
        deadline = time.time() + float(
            os.environ.get("ORACLE_QUERY_TIMEOUT_S", "1800"))
        while True:
            try:
                status, payload = q.get(timeout=5)
                break
            except Exception:  # queue.Empty — check for a dead child
                if not p.is_alive():
                    status = "err"
                    payload = f"child died without a report (exitcode {p.exitcode})"
                    break
                if time.time() > deadline:
                    p.terminate()
                    status = "err"
                    payload = "timeout: exceeded ORACLE_QUERY_TIMEOUT_S"
                    break
        p.join()
        if status == "ok":
            times[name] = round(payload, 4)
            print(f"[oracle] {name} {times[name]}s", file=sys.stderr, flush=True)
        else:
            failed[name] = str(payload).splitlines()[0][:200]
            print(f"[oracle] {name} FAILED {failed[name]}",
                  file=sys.stderr, flush=True)
    merge_target = sys.argv[4] if len(sys.argv) > 4 else None
    partial = sorted(only) if only is not None else []
    if only is not None and merge_target and os.path.exists(merge_target):
        prior = json.load(open(merge_target))
        prior.pop("_total", None)
        # merging into a file that was itself partial must PRESERVE its
        # partial marker: the union of covered queries decides whether the
        # result is still incomplete — otherwise a subset-into-subset merge
        # silently labels an incomplete set as a full run
        prior_partial = prior.pop("_partial", None)
        prior_failed = prior.pop("_failed", {})
        prior_failed.update(failed)
        for name in times:
            prior_failed.pop(name, None)
        failed = prior_failed
        prior.update(times)
        times = {k: v for k, v in prior.items() if not k.startswith("_")}
        if prior_partial is not None:
            covered = set(prior_partial) | set(only)
            partial = sorted(covered)
            if covered | set(failed) >= set(oracle):
                partial = []  # every oracle query now present → a full run
        else:
            # the prior file was labeled full, but the oracle set may have
            # GROWN since it was written (new queries land every round) —
            # recompute coverage against the CURRENT oracle set instead of
            # trusting the old label
            covered = set(times)
            partial = [] if covered | set(failed) >= set(oracle) \
                else sorted(covered)
    times["_total"] = round(sum(v for k, v in times.items() if k != "_total"), 3)
    if partial:
        # a subset run (or a merge that has not yet covered the full oracle
        # set) is explicitly partial — its _total covers only those queries
        # and must not be read as a full run's
        times["_partial"] = partial
    if failed:
        times["_failed"] = failed
    out = json.dumps(times)
    if merge_target:
        with open(merge_target, "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
    sys.exit(0)
