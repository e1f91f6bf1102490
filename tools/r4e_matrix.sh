#!/bin/bash
# Round-4e queue: segment profiles (tools fixed for PYTHONPATH) + the
# config #3 xmid retry with a 60-min timeout (the 30-min r4d attempt was
# killed mid-compile — no error, just a large Mosaic kernel population).
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4e-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; to=$2; bench=$3; shift 3
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if env "$@" timeout "$to" python "$bench" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -8 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
run seg-student 1800 tools/bench_student_segments.py
run seg-teacher 1800 tools/bench_teacher_segments.py
run x-xmid2     3600 bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
echo "=== r4e-matrix done $(date -u) ===" >> "$log"
