#!/bin/bash
# Dev loop: run graft.Verify at a scale factor, then DuckDB-compare.
# Usage: dev/check.sh [sf] [query ...]
set -e
SF="${1:-0.01}"
shift || true
cd /root/repo
sbt --batch "runMain graft.Verify /root/testdata/sf$SF /tmp/verify_sf$SF" \
  2>&1 | grep -Ev '^\[info\] (welcome|loading|compiling|done|running)' | tail -20
python3 dev/compare.py "/root/testdata/sf$SF" "/tmp/verify_sf$SF" "$@"
