#!/bin/bash
# Round-12 sweep, phase 2 (after the Multimodal/unigram changes landed):
# fresh sf5 benches, q115/q116 subset re-runs at sf0.1/sf1 (trend takes
# per-query min over runs), then the DuckDB oracle at each SF.
set -xe
cd /root/repo
T=target/trend_r12
cp target/verify_sf001/oracle_sql.json "$T/oracle_sql.json"
for run in a b; do
  SPARK_GRAFT_SF_DIR=/root/repo/target/scale-sf5 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  cp target/bench_full.json "$T/bench_sf5_${run}.json"
done
for sf in sf01:/root/testdata/sf0.1 sf1:/root/repo/target/scale-sf1; do
  name=${sf%%:*}; dir=${sf#*:}
  SPARK_GRAFT_BENCH_ONLY=q115_media_near_dup,q116_media_dedup_survivors \
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  cp target/bench_full.json "$T/bench_${name}_c.json"
done
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py /root/testdata/sf0.1 "$T/oracle_sql.json" \
  > "$T/duck_sf01.json" 2> target/duck_r12_sf01.log
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py target/scale-sf1 "$T/oracle_sql.json" \
  > "$T/duck_sf1.json" 2> target/duck_r12_sf1.log
# sf5: the all-pairs media oracles are O(n^2) = ~2500x their sf0.1 cost —
# a 900 s cap per query is already a 15x-over-Spark failure proof and
# keeps the sweep inside the session
ORACLE_QUERY_TIMEOUT_S=900 python3 tools/time_oracle.py target/scale-sf5 "$T/oracle_sql.json" \
  > "$T/duck_sf5.json" 2> target/duck_r12_sf5.log
echo SWEEP_R12B_DONE
