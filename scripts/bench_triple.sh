#!/usr/bin/env bash
# Three-way interleaved bench (r10 verdict #8): run graft.Bench on TWO
# baseline git refs plus the CURRENT working tree, interleaved
# (A B C A B C), min-of-2 per tree — re-anchoring the cumulative
# key-growth cost against one fixed reference point instead of chaining
# round-over-round pairs (each pair carries its own host-drift error; the
# chain compounds it).
#
# Usage: scripts/bench_triple.sh <refA> <labelA> <refB> <labelB> [sfDir]
#   e.g. scripts/bench_triple.sh 5e21a6b r9 0e83e75 r10 /root/testdata/sf0.1
#
# Emits one human line per run plus a final JSON summary carrying BOTH
# baselines (BENCH_PAIR_r<N>.json shape, extended).
set -euo pipefail

REFA="${1:?usage: bench_triple.sh <refA> <labelA> <refB> <labelB> [sfDir]}"
LABA="${2:?usage: bench_triple.sh <refA> <labelA> <refB> <labelB> [sfDir]}"
REFB="${3:?usage: bench_triple.sh <refA> <labelA> <refB> <labelB> [sfDir]}"
LABB="${4:?usage: bench_triple.sh <refA> <labelA> <refB> <labelB> [sfDir]}"
SF="${5:-/root/testdata/sf0.1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WTA="$(mktemp -d /tmp/graft_bench_a.XXXXXX)"
WTB="$(mktemp -d /tmp/graft_bench_b.XXXXXX)"

cleanup() {
  cd "$REPO"
  git worktree remove --force "$WTA" >/dev/null 2>&1 || true
  git worktree remove --force "$WTB" >/dev/null 2>&1 || true
  rm -rf "$WTA" "$WTB"
}
trap cleanup EXIT

cd "$REPO"
git worktree add --detach "$WTA" "$REFA" >/dev/null
git worktree add --detach "$WTB" "$REFB" >/dev/null

loadavg() { cut -d' ' -f1 /proc/loadavg; }

# loadavg guard (r11 verdict #6): a concurrent job at a timed leg's start
# skews that ONE tree by up to ~50% while the interleave only protects
# against drift hitting all trees equally. Before each timed leg, wait (up
# to GUARD_MAX_WAIT_SEC) for 1-min loadavg to fall under GUARD_LOADAVG;
# if it never does, run anyway but record the breach in the summary.
GUARD_LOADAVG="${GUARD_LOADAVG:-4.0}"
GUARD_MAX_WAIT_SEC="${GUARD_MAX_WAIT_SEC:-300}"
GUARD_BREACHES=0

guard_load() { # blocks until loadavg < GUARD_LOADAVG or timeout
  local waited=0 l
  while :; do
    l="$(loadavg)"
    if python3 -c "import sys; sys.exit(0 if float('$l') < float('$GUARD_LOADAVG') else 1)"; then
      return 0
    fi
    if [ "$waited" -ge "$GUARD_MAX_WAIT_SEC" ]; then
      echo "guard: loadavg $l still >= $GUARD_LOADAVG after ${waited}s — running anyway" >&2
      GUARD_BREACHES=$((GUARD_BREACHES + 1))
      return 0
    fi
    echo "guard: loadavg $l >= $GUARD_LOADAVG — waiting 15s" >&2
    sleep 15
    waited=$((waited + 15))
  done
}

run_bench() { # $1 = tree dir, $2 = label
  local dir="$1" label="$2" load line
  guard_load
  load="$(loadavg)"
  line="$(cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)"
  if [ -z "$line" ]; then
    echo "FATAL: no bench JSON from $label tree ($dir)" >&2
    exit 1
  fi
  local val
  val="$(printf '%s' "$line" | python3 -c 'import json,sys; print(json.load(sys.stdin)["value"])')"
  echo "run  $label  ${val}s  (loadavg_at_start=$load)" >&2
  echo "$val"
}

# warm every tree's compile outside the timed window
(cd "$WTA" && sbt -batch compile >/dev/null 2>&1)
(cd "$WTB" && sbt -batch compile >/dev/null 2>&1)
(cd "$REPO" && sbt -batch compile >/dev/null 2>&1)

# interleave A B C A B C so slow host drift hits all trees equally
A1="$(run_bench "$WTA"  "$LABA")"
B1="$(run_bench "$WTB"  "$LABB")"
W1="$(run_bench "$REPO" working)"
A2="$(run_bench "$WTA"  "$LABA")"
B2="$(run_bench "$WTB"  "$LABB")"
W2="$(run_bench "$REPO" working)"

python3 - "$REFA" "$LABA" "$REFB" "$LABB" "$SF" "$A1" "$A2" "$B1" "$B2" "$W1" "$W2" \
    "$GUARD_LOADAVG" "$GUARD_MAX_WAIT_SEC" "$GUARD_BREACHES" <<'EOF'
import json, sys
refa, laba, refb, labb, sf = sys.argv[1:6]
a = min(float(sys.argv[6]), float(sys.argv[7]))
b = min(float(sys.argv[8]), float(sys.argv[9]))
w = min(float(sys.argv[10]), float(sys.argv[11]))
print(json.dumps({
    "baseline_refs": {laba: refa, labb: refb}, "sf_dir": sf,
    "baseline_sec": {laba: round(a, 2), labb: round(b, 2)},
    "working_sec": round(w, 2),
    "delta_pct": {f"vs_{laba}": round(100.0 * (w - a) / a, 1) if a else None,
                  f"vs_{labb}": round(100.0 * (w - b) / b, 1) if b else None},
    "runs": {laba: [float(sys.argv[6]), float(sys.argv[7])],
             labb: [float(sys.argv[8]), float(sys.argv[9])],
             "working": [float(sys.argv[10]), float(sys.argv[11])]},
    "load_guard": {"threshold": float(sys.argv[12]),
                   "max_wait_sec": int(sys.argv[13]),
                   "breaches": int(sys.argv[14])},
    "protocol": "interleaved min-of-2 per tree, three-way, same host, "
                "same session, loadavg-guarded legs"}))
EOF
