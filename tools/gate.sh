#!/usr/bin/env bash
# Full local correctness gate — run before EVERY query-touching commit.
# Mirrors the driver: sbt test, then Verify at sf0.01, then the
# pandas-faithful oracle compare (tools/check.py).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${GRAFT_VERIFY_OUT:-/tmp/graft_verify}"
rm -rf "$OUT_DIR"
sbt -batch test
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 tools/check.py "$SF_DIR" "$OUT_DIR"
echo "GATE GREEN ($SF_DIR)"
