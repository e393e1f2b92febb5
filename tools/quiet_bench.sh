#!/bin/bash
# Quiet-window bench capture: run graft.Bench only when the box is idle
# enough that the number means something. Rounds 5-7 checked in driver
# benches inflated 2-5x by concurrent load (r7: 119.5 s driver vs 49.1 s
# judge on identical code); this script makes the quiet capture the
# enforced default instead of advice.
#
# Usage: tools/quiet_bench.sh [outfile] [sfdir] [max_load] [max_wait_sec]
#   outfile      where the single Bench JSON line goes (default BENCH_quiet.json)
#   sfdir        scale-factor dir (default /root/testdata/sf0.1)
#   max_load     1-min loadavg gate; waits until below (default 4.0 on 32 CPUs)
#   max_wait_sec give up after this long (default 1800)
#
# The gate re-checks AFTER the run too: if load rose above the gate while
# benching, the capture is suspect and the script says so (exit 2) rather
# than checking in a polluted number.
set -euo pipefail
cd "$(dirname "$0")/.."
out=${1:-BENCH_quiet.json}
sf=${2:-/root/testdata/sf0.1}
max_load=${3:-4.0}
max_wait=${4:-1800}

load() { cut -d' ' -f1 /proc/loadavg; }
below() { awk -v l="$1" -v m="$max_load" 'BEGIN{exit !(l<=m)}'; }

waited=0
while ! below "$(load)"; do
  if [ "$waited" -ge "$max_wait" ]; then
    echo "quiet_bench: gave up after ${max_wait}s (load $(load) > $max_load)" >&2
    exit 1
  fi
  echo "quiet_bench: load $(load) > $max_load — waiting 30s" >&2
  sleep 30; waited=$((waited+30))
done
pre=$(load)
echo "quiet_bench: load $pre <= $max_load — running bench on $sf" >&2

# Bench prints the FULL per-query record first and a trimmed top-25
# headline last (sized for the harness's 2000-char tail window); the
# quiet capture wants the full record — prefer BENCH_last_run.json
# (always the full line), falling back to the first stdout JSON line.
# Delete any stale BENCH_last_run.json FIRST so a failed run can never be
# silently masked by a previous bench's file (the no-JSON guard below
# stays reachable).
rm -f BENCH_last_run.json
SPARK_GRAFT_SF_DIR="$sf" sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep -E '^\{"metric"' | head -1 > "$out"
if [ -s BENCH_last_run.json ]; then cp BENCH_last_run.json "$out"; fi
[ -s "$out" ] || { echo "quiet_bench: Bench produced no JSON line" >&2; exit 1; }

post=$(load)
echo "quiet_bench: wrote $out (load before=$pre after=$post)" >&2
python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
top = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:5]
print("total %.1f s, failed %s; top-5: %s" %
      (d["value"], d.get("failed"), ", ".join(f"{k}={v:.2f}s" for k, v in top)))
EOF
if ! below "$post"; then
  echo "quiet_bench: WARNING load rose to $post during the run — capture suspect, re-run" >&2
  exit 2
fi
