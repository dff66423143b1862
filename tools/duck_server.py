#!/usr/bin/env python
"""Long-lived DuckDB oracle server for the differential fuzzer
(DifferentialFuzzSuite). Speaks JSON-lines over stdin/stdout:

  request:  {"id": 7, "sql": "SELECT ..."}
  response: {"id": 7, "cols": ["a","b"], "rows": [[cell,...],...]}
          | {"id": 7, "error": "..."}

Cells are TYPED so the Scala side never guesses: null stays null,
everything else is a [tag, payload] pair — ["i","<decimal string>"] for
integers (stringified: BIGINT/HUGEINT exceed JSON's 2^53 safe range),
["f","<repr>"] for floats (repr round-trips the exact IEEE double),
["s",...] strings, ["b",true|false] booleans, ["a",[cells...]] lists.

argv[1] = directory of parquet tables; every *.parquet in it is
registered as a view named after the file stem. The fuzzer writes its
fixture there before spawning this server, so both engines read the
same bytes.
"""
import sys, os, json, glob, math
import duckdb

d = sys.argv[1]
con = duckdb.connect()
for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
    name = os.path.splitext(os.path.basename(p))[0]
    # Spark writes <name>.parquet as a DIRECTORY of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")


def cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ["b", v]
    if isinstance(v, int):
        return ["i", str(v)]
    if isinstance(v, float):
        if math.isnan(v):
            return ["f", "NaN"]
        return ["f", repr(v)]
    if isinstance(v, str):
        return ["s", v]
    if isinstance(v, (list, tuple)):
        return ["a", [cell(x) for x in v]]
    if isinstance(v, bytes):
        return ["s", v.hex()]
    # decimals, timestamps: render via str — the fuzzer's twins cast
    # everything to BIGINT/DOUBLE/VARCHAR, so hitting this is a twin bug.
    return ["s", str(v)]


for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    req = json.loads(line)
    out = {"id": req["id"]}
    try:
        cur = con.execute(req["sql"])
        cols = [c[0] for c in cur.description]
        rows = cur.fetchall()
        out["cols"] = cols
        out["rows"] = [[cell(v) for v in r] for r in rows]
    except Exception as e:  # noqa: BLE001 — report, never die mid-fuzz
        out["error"] = f"{type(e).__name__}: {e}"
    sys.stdout.write(json.dumps(out) + "\n")
    sys.stdout.flush()
