#!/usr/bin/env bash
# Controlled-pair bench protocol (dev tool): run graft.Bench on a BASELINE
# git ref and on the CURRENT working tree back-to-back, interleaved
# (A B A B), taking the min of two runs per tree — the only way to read a
# bench delta on this host, where day-to-day drift on IDENTICAL code is
# ±13-35% but same-day interleaved pairs are stable. Records loadavg before
# every run so an artifact can be discounted when the host was contended.
#
# Usage: scripts/bench_pair.sh <baseline-git-ref> [sfDir]
#   e.g. scripts/bench_pair.sh HEAD~1 /root/testdata/sf0.1
#
# Emits one human line per run plus a final JSON summary:
#   {"baseline_ref":…,"baseline_sec":…,"working_sec":…,"delta_pct":…,…}
set -euo pipefail

REF="${1:?usage: bench_pair.sh <baseline-git-ref> [sfDir]}"
SF="${2:-/root/testdata/sf0.1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="$(mktemp -d /tmp/graft_bench_base.XXXXXX)"

cleanup() {
  cd "$REPO"
  git worktree remove --force "$WT" >/dev/null 2>&1 || true
  rm -rf "$WT"
}
trap cleanup EXIT

cd "$REPO"
git worktree add --detach "$WT" "$REF" >/dev/null

loadavg() { cut -d' ' -f1 /proc/loadavg; }

# loadavg guard (r11 verdict #6, shared with bench_triple.sh): wait out a
# concurrent job before each timed leg instead of letting it skew one tree
GUARD_LOADAVG="${GUARD_LOADAVG:-4.0}"
GUARD_MAX_WAIT_SEC="${GUARD_MAX_WAIT_SEC:-300}"
GUARD_BREACHES=0

guard_load() {
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

# warm the baseline tree's compile outside the timed window
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)
(cd "$REPO" && sbt -batch compile >/dev/null 2>&1)

# interleave A B A B so slow host drift hits both trees equally
B1="$(run_bench "$WT"   baseline)"
W1="$(run_bench "$REPO" working)"
B2="$(run_bench "$WT"   baseline)"
W2="$(run_bench "$REPO" working)"

python3 - "$REF" "$SF" "$B1" "$B2" "$W1" "$W2" \
    "$GUARD_LOADAVG" "$GUARD_MAX_WAIT_SEC" "$GUARD_BREACHES" <<'EOF'
import json, sys
ref, sf = sys.argv[1], sys.argv[2]
b = min(float(sys.argv[3]), float(sys.argv[4]))
w = min(float(sys.argv[5]), float(sys.argv[6]))
print(json.dumps({
    "baseline_ref": ref, "sf_dir": sf,
    "baseline_sec": round(b, 2), "working_sec": round(w, 2),
    "delta_pct": round(100.0 * (w - b) / b, 1) if b else None,
    "runs": {"baseline": [float(sys.argv[3]), float(sys.argv[4])],
             "working": [float(sys.argv[5]), float(sys.argv[6])]},
    "load_guard": {"threshold": float(sys.argv[7]),
                   "max_wait_sec": int(sys.argv[8]),
                   "breaches": int(sys.argv[9])},
    "protocol": "interleaved min-of-2 per tree, same host, same session, "
                "loadavg-guarded legs"}))
EOF
