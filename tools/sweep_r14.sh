#!/bin/bash
# Round-14 trend sweep. Fixes the r13 script's two reproducibility bugs
# and adds a box-hour calibration anchor:
#   1. PER-SF oracle dumps — the learned-BPE/recall twins differ per
#      corpus, so each SF gets its own oracle_sql.json
#      (SPARK_GRAFT_VERIFY_ONLY=__none__ runs zero queries but writes
#      the right oracle surface, materializing artifacts on demand).
#   2. Run names ('a','b') are THE names tools/trend_r14.py consumes —
#      one RUNS list shared by reading this script's output directly.
#   3. CALIBRATION: before each SF block, a fixed tiny workload is timed
#      on both engines (Spark: q01+q35 at sf0.1 via Bench;
#      DuckDB: the same two oracle twins at sf0.1). Cross-round deltas
#      then decompose into box-drift × code via cal_* files.
# Serial on purpose — timing purity (never co-tenant sbt with a timing
# pass; verify skill).
set -xe
cd /root/repo
T=target/trend_r14
mkdir -p "$T"

calibrate() {  # $1 = tag
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY=q01_scan_timerange,q35_lineitem_pricing \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  cp target/bench_full.json "$T/cal_spark_$1.json"
  python3 tools/time_oracle.py /root/testdata/sf0.1 \
    "$T/oracle_sf01/oracle_sql.json" \
    q01_scan_timerange,q35_lineitem_pricing \
    > "$T/cal_duck_$1.json" 2>/dev/null
}

# --- per-SF oracle dumps (cheap: zero queries run; artifacts the twins
# embed — BPE merges, recall shortlists — materialize if missing)
for sf in sf01:/root/testdata/sf0.1 sf1:/root/repo/target/scale-sf1 sf5:/root/repo/target/scale-sf5; do
  name=${sf%%:*}; dir=${sf#*:}
  SPARK_GRAFT_VERIFY_ONLY=__none__ \
    sbt -batch "runMain graft.Verify $dir $T/oracle_$name" >/dev/null 2>&1
  echo "ORACLE DUMP $name done"
done

# --- bench: 2 runs per SF, per-query min taken by trend_r14.py.
# SPARK_DRIVER_MEM=8g, NOT the historical 48g: measured at sf5 (r14),
# the oversized heap is strictly worse for the shuffle-heavy queries —
# q78 82.1 s @48g / 66.1 s @16g / 39.2 s @8g isolated; full surface
# 399 s @48g vs 290 s @8g, no OOM anywhere. Oversized execution memory
# grows in-memory aggregation structures past cache-friendliness and
# stalls on GCLocker'd humongous allocations; the same lesson as
# executor sizing at 100 TB — more heap is not more speed.
for sf in sf01:/root/testdata/sf0.1 sf1:/root/repo/target/scale-sf1 sf5:/root/repo/target/scale-sf5; do
  name=${sf%%:*}; dir=${sf#*:}
  calibrate "$name"
  for run in a b; do
    SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1
    cp target/bench_full.json "$T/bench_${name}_${run}.json"
    echo "BENCH ${name} ${run} done"
  done
done

# --- DuckDB side, each SF against ITS OWN oracle dump
calibrate duck_pre
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py /root/testdata/sf0.1 \
  "$T/oracle_sf01/oracle_sql.json" > "$T/duck_sf01.json" 2> target/duck_r14_sf01.log
ORACLE_QUERY_TIMEOUT_S=1800 python3 tools/time_oracle.py target/scale-sf1 \
  "$T/oracle_sf1/oracle_sql.json" > "$T/duck_sf1.json" 2> target/duck_r14_sf1.log
# sf5: the all-pairs media oracles are O(n^2) — a 900 s cap per query is
# already a failure proof many times over Spark's cost
ORACLE_QUERY_TIMEOUT_S=900 python3 tools/time_oracle.py target/scale-sf5 \
  "$T/oracle_sf5/oracle_sql.json" > "$T/duck_sf5.json" 2> target/duck_r14_sf5.log
calibrate duck_post
echo SWEEP_R14_DONE
