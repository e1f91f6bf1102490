#!/bin/bash
# Round-4d measurement queue (sequential; 1-core host):
#   1. config #3 xmid A/B with the lane-aware VMEM fix (entry block3 OOM)
#   2. backbone-replacement variant vs its v2 target, +KDCC_SEP_MIN_DIL=1 A/B
#   3. fresh student/teacher segment profiles (post dh-fold/host-S2D/NW)
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4d-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; bench=$2; shift 2
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if env "$@" timeout 1800 python "$bench" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -1 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
run x-xmid      bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
run variant     bench.py KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 KDCC_BENCH_SCOPE=backbone.layer3,backbone.layer4,classifier
run variant-d1  bench.py KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 KDCC_BENCH_SCOPE=backbone.layer3,backbone.layer4,classifier KDCC_SEP_MIN_DIL=1
run seg-student tools/bench_student_segments.py
run seg-teacher tools/bench_teacher_segments.py
echo "=== r4d-matrix done $(date -u) ===" >> "$log"
