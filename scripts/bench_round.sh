#!/usr/bin/env bash
# Per-round bench protocol (r9 verdict items 5+6): produce BOTH scale points
# with loadavg stamps so the round's perf claim never rests on one
# cross-day single:
#
#   1. BENCH_PAIR_r<N>.json — interleaved A/B pair vs a baseline ref at
#      sf0.1 (scripts/bench_pair.sh), the honest same-day delta.
#   2. BENCH_SF1_r<N>.json  — one stamped run at the sf1 stress fixture
#      (10× the largest driver SF), tracking scale drift round over round
#      instead of rediscovering it.
#
# Usage: scripts/bench_round.sh <round> <baseline-git-ref> [sf1Dir]
#   e.g. scripts/bench_round.sh 10 5e21a6b /tmp/graft_stress/sf1
set -euo pipefail

ROUND="${1:?usage: bench_round.sh <round> <baseline-git-ref> [sf1Dir]}"
REF="${2:?usage: bench_round.sh <round> <baseline-git-ref> [sf1Dir]}"
SF1="${3:-/tmp/graft_stress/sf1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

echo "== interleaved pair vs $REF at sf0.1 ==" >&2
scripts/bench_pair.sh "$REF" /root/testdata/sf0.1 | tail -1 \
  > "BENCH_PAIR_r${ROUND}.json"
cat "BENCH_PAIR_r${ROUND}.json" >&2

if [ -d "$SF1" ]; then
  echo "== sf1 stress bench ($SF1) ==" >&2
  LOAD="$(cut -d' ' -f1 /proc/loadavg)"
  LINE="$(SPARK_GRAFT_SF_DIR="$SF1" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep -o '{"metric".*}' | tail -1)"
  python3 - "$LOAD" "$SF1" <<EOF > "BENCH_SF1_r${ROUND}.json"
import json, os, sys
d = json.loads('''$LINE''')
d["loadavg_at_start"] = float(sys.argv[1])
d["sf_dir"] = sys.argv[2]
# fold in the FULL per-key map graft.Bench wrote beside the run (the stdout
# line keeps only the headline keys so the driver's tail capture stays short)
pk = d.get("perkey_file", "")
if pk and os.path.isfile(pk):
    with open(pk) as f:
        d["queries"] = json.load(f)["queries"]
print(json.dumps(d))
EOF
  cat "BENCH_SF1_r${ROUND}.json" >&2

  # standing scale gate (r13): per-key sf1/sf0.1 ratios vs the threshold +
  # boundedness-class allowlist in graft.ScaleGate — fails the round bench
  # on an unallowed quadratic (the r12 class: green total, x60 key).
  # bench_pair.sh's working-tree leg left bench_perkey_sf0.1.json in CWD;
  # the sf1 run above left bench_perkey_sf1.json.
  if [ -f bench_perkey_sf0.1.json ] && [ -f bench_perkey_sf1.json ]; then
    echo "== scale gate (sf1/sf0.1 per-key ratios) ==" >&2
    sbt -batch "runMain graft.ScaleGate bench_perkey_sf0.1.json bench_perkey_sf1.json" \
      | grep '\[scale-gate\]' >&2
  else
    echo "WARN: per-key files missing — scale gate skipped" >&2
  fi
else
  echo "WARN: sf1 fixture $SF1 missing — run scripts/make_stress_fixtures.py first" >&2
fi
