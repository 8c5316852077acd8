#!/usr/bin/env bash
# Bench + regression tripwire: run the full per-query bench at sf0.1 and
# fail if any query regressed >2x vs the last recorded round — catches a
# contaminated run (round-4: 11 unchanged-code queries read 3-30x slower)
# at the repo instead of at the judge.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.1}"
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.Bench"
python3 tools/bench_diff.py bench_last.json
