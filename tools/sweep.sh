#!/usr/bin/env bash
# Full-corpus correctness sweep at an arbitrary SF — the round-protocol
# scale-stability gate (VERDICT r6 #7). The driver gates at sf0.01; this
# replays the exact same Verify -> DuckDB-compare pipeline at sf0.1 (or
# any SF dir) to catch scale-dependent determinism (ties, rounding
# half-boundaries, limit stability) before the driver ever could.
#
# Usage: tools/sweep.sh [sfDir] [outDir] [jsonOut]
#   default sfDir  = /root/testdata/sf0.1
#   default outDir = /tmp/graft_sweep_<sf-basename>
#   default jsonOut = CORRECTNESS_LOCAL_<sf-basename>.json in the repo
#     root — the builder-side correctness artifact (VERDICT r13 #3: the
#     driver's CORRECTNESS_r13.json arrived empty, so the round's
#     signal must survive a driver glitch). Committed at round close.
#
# Protocol per round: run once at round HEAD, record "N/N pass" in
# BASELINE.md under "Full-corpus sfX sweep (round R)".
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.1}"
OUT_DIR="${2:-/tmp/graft_sweep_$(basename "$SF_DIR")}"
cd "$(dirname "$0")/.."
JSON_OUT="${3:-$PWD/CORRECTNESS_LOCAL_$(basename "$SF_DIR").json}"
rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 tools/compare.py "$SF_DIR" "$OUT_DIR" "$JSON_OUT"
