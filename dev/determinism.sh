#!/bin/bash
# Partitioning-invariance sweep: every registered query must hash
# identically under two different physical layouts (shuffle partition
# count + scan split size). Catches the q139 class engine-side: any
# result that depends on partition layout would silently drift on a
# real cluster. Usage: dev/determinism.sh [SF]   (default 0.001)
set -eo pipefail
cd "$(dirname "$0")/.."
SF="${1:-0.001}"
export SPARK_GRAFT_SF_DIR="/root/testdata/sf$SF"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
# forked-run output is unprefixed since the StdoutOutput switch
# (build.sbt); tolerate both forms
sbt -batch "runMain graft.DeterminismCheck" 2>/dev/null \
  | grep -E '^(\[info\] )?(DRIFT|\{)' | sed 's/^\[info\] //'
