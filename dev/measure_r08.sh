#!/bin/bash
# Round-8 consolidated measurement: full bench sweep at the final
# registry, then the 10x scale panel (corpus + new relational family).
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
echo "[measure] full sweep start $(date -u +%H:%M:%S)" >&2
sbt -batch "runMain graft.Bench" >/dev/null 2>&1
cp target/bench.json BENCH_r08_full.json
echo "[measure] full sweep done $(date -u +%H:%M:%S)" >&2
echo "[measure] scalebench start" >&2
# tolerate both prefixed and (since the r10 StdoutOutput switch)
# unprefixed forked-run output
SPARK_GRAFT_SCALE_MULT=10 sbt -batch "runMain graft.ScaleBench" 2>/dev/null \
  | grep -E '^(\[info\] )?\{' | sed 's/^\[info\] //' > SCALEBENCH_r08.jsonl
echo "[measure] scalebench done $(date -u +%H:%M:%S)" >&2
