#!/bin/bash
# Round-13 trend sweep: bench (2 runs per SF, per-query min taken by
# trend_r13.py) then the DuckDB oracle at each SF. Serial on purpose —
# timing purity (never co-tenant sbt with a timing pass; verify skill).
set -xe
cd /root/repo
T=target/trend_r13
mkdir -p "$T"
cp target/verify_sf001/oracle_sql.json "$T/oracle_sql.json"
for sf in sf01:/root/testdata/sf0.1 sf1:/root/repo/target/scale-sf1 sf5:/root/repo/target/scale-sf5; do
  name=${sf%%:*}; dir=${sf#*:}
  for run in a b; do
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1
    cp target/bench_full.json "$T/bench_${name}_${run}.json"
    echo "BENCH ${name} ${run} done"
  done
done
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py /root/testdata/sf0.1 "$T/oracle_sql.json" \
  > "$T/duck_sf01.json" 2> target/duck_r13_sf01.log
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py target/scale-sf1 "$T/oracle_sql.json" \
  > "$T/duck_sf1.json" 2> target/duck_r13_sf1.log
# sf5: the all-pairs media oracles are O(n^2) — a 900 s cap per query is
# already a failure proof many times over Spark's cost and keeps the
# sweep inside the session
ORACLE_QUERY_TIMEOUT_S=900 python3 tools/time_oracle.py target/scale-sf5 "$T/oracle_sql.json" \
  > "$T/duck_sf5.json" 2> target/duck_r13_sf5.log
echo SWEEP_R13_DONE
