#!/usr/bin/env bash
# Round-end correctness self-check: run the full Verify dump at sf0.01
# and the DuckDB oracle compare, committing the per-query record as
# CORRECTNESS_self_r{N}.json. Exists because round 12's driver gate
# crashed before writing any row ({} artifact) — 14 new queries shipped
# with zero correctness evidence. A committed self-run makes that
# failure mode impossible: the round always carries its own record.
#
# Usage: tools/self_check.sh <round-number> [sf-dir]
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: self_check.sh <round-number> [sf-dir]}"
SF_DIR="${2:-/root/testdata/sf0.01}"
# fresh dir per run: stale dumps at a canonical path (from a prior
# round or the judge's own runs) would mask a query that fails to
# dump today as a false OK
OUT="$(mktemp -d /tmp/self_check_out.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT
sbt -batch "runMain graft.Verify $SF_DIR $OUT"
python3 tools/check_oracle.py "$SF_DIR" "$OUT" \
  "CORRECTNESS_self_r${ROUND}.json"
