#!/usr/bin/env bash
# Interleaved control bench (the BASELINE.md reading rule, as a tool):
# alternate full sf0.1 bench legs between a BASE commit and the current
# HEAD tree in one session, so ambient container drift hits both variants
# and the per-variant per-query MINIMA are comparable. This is the only
# honest cross-commit reading this container supports — single suite
# totals drift ±30% between runs (see BASELINE.md "reading rule").
#
# usage: tools/ctrl_bench.sh <base-commit> [legs-per-variant] [outdir]
#   e.g. tools/ctrl_bench.sh 6aec0cb 2 bench/r22
#
# Writes <outdir>/ctrl_base{i}.json and <outdir>/ctrl_head{i}.json (the
# BENCH_FULL.json of each leg: full query names + per-query spread), then
# prints the per-variant minima comparison via tools/ctrl_read.py.
set -euo pipefail
BASE_COMMIT="${1:?usage: ctrl_bench.sh <base-commit> [legs] [outdir]}"
LEGS="${2:-2}"
OUTDIR="${3:-bench/ctrl}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
WORKTREE="/tmp/graft_ctrl_base"

mkdir -p "$REPO/$OUTDIR"
if [ ! -d "$WORKTREE" ]; then
  git -C "$REPO" worktree add --detach "$WORKTREE" "$BASE_COMMIT"
else
  git -C "$WORKTREE" checkout --detach "$BASE_COMMIT"
fi

run_leg() { # $1 = dir, $2 = output json path
  (cd "$1" && SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" > /tmp/ctrl_leg.log 2>&1)
  cp "$1/BENCH_FULL.json" "$2"
  tail -c 300 "$2"; echo
}

for i in $(seq 1 "$LEGS"); do
  echo "=== leg $i: base ($BASE_COMMIT) ==="
  run_leg "$WORKTREE" "$REPO/$OUTDIR/ctrl_base$i.json"
  echo "=== leg $i: head ==="
  run_leg "$REPO" "$REPO/$OUTDIR/ctrl_head$i.json"
done

python3 "$REPO/tools/ctrl_read.py" "$REPO/$OUTDIR"
