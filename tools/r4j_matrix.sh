#!/bin/bash
# Round-4j queue (this session, after the sep-kernel default flip landed at
# 289.5 img/s): re-baseline everything whose graph changed, then profile the
# two remaining gap clusters (decoder head, student f3-6) at the NEW
# defaults so the next kernel work aims at live numbers, not r4e-era ones.
# (The r4i results were lost with /tmp between sessions.)
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
# Per-run outputs always land in /tmp/measure/$name.out, so create it even
# when a custom $1 log path points elsewhere.
mkdir -p "$(dirname "$log")" /tmp/measure
echo "=== $(date -u) r4j-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; to=$2; bench=$3; shift 3
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if env "$@" timeout "$to" python "$bench" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -40 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
run head-confirm  900 bench.py KDCC_NOOP=0
run variant-nosep 900 bench.py KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 KDCC_BENCH_SCOPE=backbone.layer3,backbone.layer4,classifier
run x-stock-nosep 1500 bench_xception.py KDCC_PALLAS_XMID=0
# Config #3's dangling measurement (VERDICT r3 missing #3): the adaptive
# block heights (xchain._bh_for, c*lanes cut) fixed both v5e VMEM OOMs —
# this is the first hardware run of the 1,140-LoC xchain kernels.
run x-xmid 2400 bench_xception.py KDCC_PALLAS_XMID=1

prof() {
  name=$1; to=$2; shift 2
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if timeout "$to" "$@" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -45 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
prof seg-student 1800 python tools/bench_student_segments.py
prof prof-head    900 python tools/profile_kd.py --what head --top 30
echo "=== r4j-matrix done $(date -u) ===" >> "$log"
