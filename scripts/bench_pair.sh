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

run_bench() { # $1 = tree dir, $2 = label
  local dir="$1" label="$2" load line
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

python3 - "$REF" "$SF" "$B1" "$B2" "$W1" "$W2" <<'EOF'
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
    "protocol": "interleaved min-of-2 per tree, same host, same session"}))
EOF
