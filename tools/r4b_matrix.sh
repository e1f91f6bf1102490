#!/bin/bash
# Round-4b measurement queue: NW stem->IR handoff + host-S2D default-on
# (head), the VMEM-fixed config #3 xmid A/B, the backbone-replacement
# variant against its own v2 target, and fresh segment profiles for the
# remaining gap clusters. Sequential — the host has one core.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4b-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
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
run head-nw     bench.py
run head-nw-nos2d bench.py KDCC_HOST_S2D=0
run x-xmid      bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
run variant     bench.py KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 KDCC_BENCH_SCOPE=backbone.layer3,backbone.layer4,classifier
run seg-student tools/bench_student_segments.py
run seg-teacher tools/bench_teacher_segments.py
echo "=== r4b-matrix done $(date -u) ===" >> "$log"
