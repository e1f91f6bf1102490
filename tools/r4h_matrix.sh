#!/bin/bash
# Round-4h queue: f0 default confirm, ASPP-separable A/B (Pallas sep kernel
# vs stock XLA at 33² — the profiled 1.65 ms fwd cluster), xchain abort
# probe (localizes config #3's TPU abort per unit), student segments rerun.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4h-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; to=$2; bench=$3; shift 3
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if env "$@" timeout "$to" python "$bench" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -12 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
run head-default  900 bench.py
run sep-xla       900 bench.py KDCC_SEP_MIN_DIL=99
run probe-xchain 2400 tools/probe_xchain.py KDCC_PALLAS_XMID=1
run seg-student  1800 tools/bench_student_segments.py
echo "=== r4h-matrix done $(date -u) ===" >> "$log"
