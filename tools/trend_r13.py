#!/usr/bin/env python
"""Round-13 trend assembly: min-of-2 Spark runs vs DuckDB timings at
sf0.1 / sf1 / sf5 over the 86-query shared surface (q69 is rows-only,
no oracle), printed ready to paste into BASELINE.md.

Inputs under target/trend_r13/: bench_{sf01,sf1,sf5}_{a,b}.json (raw
Bench lines) and duck_{sf01,sf1,sf5}.json (time_oracle.py output)."""
import json

D = 'target/trend_r13'


def load(p):
    raw = open(p).read()
    if '{' not in raw:
        raise ValueError(f'{p}: no JSON object (empty/truncated run?)')
    return json.loads(raw[raw.index('{'):])


def spark_min(sf):
    out = {}
    # published numbers are min over the SHIPPED-code runs only: c =
    # isolated re-runs of the six queries changed mid-round, d/e = full
    # passes after everything landed. Runs a/b measured superseded
    # variants of those six queries and are deliberately excluded.
    for run in ('c', 'd', 'e'):
        try:
            qs = load(f'{D}/bench_{sf}_{run}.json')['queries']
        except FileNotFoundError:
            continue
        for k, v in qs.items():
            out[k] = min(out.get(k, 1e18), v)
    return out


def duck(sf):
    try:
        return {k: v for k, v in load(f'{D}/duck_{sf}.json').items()
                if not k.startswith('_')}
    except (FileNotFoundError, ValueError) as e:
        print(f'WARN: duck_{sf} unusable ({e}) — {sf} ratios omitted')
        return {}


sp = {sf: spark_min(sf) for sf in ('sf01', 'sf1', 'sf5')}
du = {sf: duck(sf) for sf in ('sf01', 'sf1', 'sf5')}

for sf in ('sf01', 'sf1', 'sf5'):
    shared = sorted(set(sp[sf]) & set(du[sf]))
    ts = sum(sp[sf][k] for k in shared)
    td = sum(du[sf][k] for k in shared)
    ratio = f"{ts/td:.2f}x" if td > 0 else "n/a (no oracle data)"
    print(f"{sf}: {len(shared)}q spark {ts:.1f}s duck {td:.1f}s "
          f"ratio {ratio}")

shared5 = set(sp['sf5']) & set(du['sf5'])
rows = sorted(shared5, key=lambda k: -sp['sf5'][k])[:12]
print('\n| query | sf0.1 | sf1 | sf5 |')
print('|---|---|---|---|')
for k in rows:
    cells = []
    for sf in ('sf01', 'sf1', 'sf5'):
        s, d = sp[sf].get(k), du[sf].get(k)
        cells.append(f"{s:.2f}s / {s/d:.2f}×" if s and d else "—")
    print(f"| {k} | {cells[0]} | {cells[1]} | {cells[2]} |")
