#!/usr/bin/env bash
# Identical-bytes bench control (r12 verdict #1, standing per-round).
#
# The driver's bench record is taken on a shared box whose host-level
# CPU steal is invisible in-VM (SCALE.md r11: identical bytes measured
# 1.4-2.1x apart across days; r12: the driver's record breached the 2x
# gate at face value purely from host load). This script produces the
# rebuttal artifact BEFORE it is needed: it re-runs the PREVIOUS
# round's exact bytes in a worktree, full Bench discipline (warm-up +
# min-of-2), and writes BENCH_BASE_r<N>.json. Run it back-to-back with
# the end-of-round bench of the NEW bytes, commit both, and record the
# same-hour ratio in SCALE.md. Any later cross-round delta can then be
# split into (code delta) x (host drift) with committed numbers.
#
# Usage: tools/bench_control.sh <prev-round-commit> <round-number>
#   e.g. tools/bench_control.sh d9ec15b 13
set -euo pipefail
COMMIT="${1:?previous-round commit}"
ROUND="${2:?round number}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="/tmp/graft_base_r${ROUND}"

cd "$REPO"
git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$COMMIT"
trap 'cd "$REPO" && git worktree remove --force "$WT" 2>/dev/null || true' EXIT

cd "$WT"
# sbt in the worktree reuses the shared coursier/ivy caches; the build
# itself is the previous round's bytes, bit-for-bit. NOTE: do not use
# `sbt --error` here — it suppresses the forked run's [info]-level
# stdout, so the metric lines never appear (r13 lesson: the first
# control run burned 24 minutes and grep'd nothing).
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt --batch "runMain graft.Bench" \
  | grep '"metric"' | sed 's/^\[info\] //' > /tmp/bench_base_r${ROUND}.out

head -1 /tmp/bench_base_r${ROUND}.out > "$REPO/BENCH_BASE_r${ROUND}.json"
echo "[control] wrote BENCH_BASE_r${ROUND}.json ($(
  python3 -c "import json;print(json.load(open('$REPO/BENCH_BASE_r${ROUND}.json'))['value'])" 2>/dev/null || echo '?') s total)"
