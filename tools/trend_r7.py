#!/usr/bin/env python
"""Round-7 trend assembly: merge the min-of-2 Spark runs and the DuckDB
timings at sf0.1 / sf1 / sf5 into shared-surface totals plus the
heaviest-query rows, ready to paste into BASELINE.md."""
import json


def load(p):
    raw = open(p).read()
    return json.loads(raw[raw.index('{'):])


def qmin(*files):
    out = {}
    for f in files:
        d = load(f)
        qs = d.get('queries', d)
        for k, v in qs.items():
            if k.startswith('_'):
                continue
            out[k] = min(out.get(k, 1e18), v)
    return out


sp = {
    '01': load('target/bench_sf01_min.json'),
    '1': load('target/bench_sf1_min.json'),
    '5': load('target/bench_sf5_min.json'),
}
du = {
    '01': load('target/duck_sf01_merged.json'),
    '1': load('target/duck_sf1_merged.json'),
    '5': {k: v for k, v in load('target/duck_sf5.json').items()
          if not k.startswith('_')},
}
failed5 = load('target/duck_sf5.json').get('_failed', {})

for sf in ['01', '1', '5']:
    shared = sorted(set(sp[sf]) & set(du[sf]))
    ts = sum(sp[sf][k] for k in shared)
    td = sum(du[sf][k] for k in shared)
    print(f"sf{sf}: {len(shared)}q spark {ts:.1f}s duck {td:.1f}s "
          f"ratio {ts/td:.2f}x")
print('duck failed at sf5:', sorted(failed5))

shared5 = set(sp['5']) & set(du['5'])
rows = sorted(shared5, key=lambda k: -sp['5'][k])[:12]
print('\n| query | sf0.1 | sf1 | sf5 |')
print('|---|---|---|---|')
for k in rows:
    cells = []
    for sf in ['01', '1', '5']:
        s, d = sp[sf].get(k), du[sf].get(k)
        cells.append(f"{s:.2f}s / {s/d:.2f}×" if s and d else "—")
    print(f"| {k} | {cells[0]} | {cells[1]} | {cells[2]} |")
