#!/bin/bash
# Round-4i queue (after the sep-kernel default flip): re-baseline the
# backbone-replacement variant and config #3 at the new defaults, decoder
# head profiles (DECNW=0/1) for VERDICT item 3, and the zero-code
# DEC_BH_BWD=4 decoder-NW retry.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4i-matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
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
run variant-nosep 900 bench.py KDCC_BENCH_STUDENT=deeplabv3plus_resnet50 KDCC_BENCH_SCOPE=backbone.layer3,backbone.layer4,classifier
run x-stock2     1200 bench_xception.py KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=0
run decnw-bh4     900 bench.py KDCC_PALLAS_DECODER_NW=1 KDCC_DEC_BH_BWD=4

prof() {
  name=$1; to=$2; shift 2
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if "$@" > "/tmp/measure/$name.out" 2>&1; then
    grep -v WARNING "/tmp/measure/$name.out" | tail -45 >> "$log"
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S) -- /tmp/measure/$name.out]" >> "$log"
  fi
  set +o pipefail
}
prof prof-head    900 timeout 900 python tools/profile_kd.py --what head --top 30
prof prof-head-nw 900 env KDCC_PALLAS_DECODER_NW=1 KDCC_DEC_BH_BWD=4 timeout 900 python tools/profile_kd.py --what head --top 30
# config #3 abort bisection: every xchain unit passed individually
# (probe_xchain r4h), so split the full KD program in half
prof x-student-xmid 1800 env KDCC_PALLAS_XMID=1 timeout 1800 python tools/profile_kd.py --what student_step --student deeplabv3plus_xception --batch 4 --hw 769 --top 12
prof x-teacher-xmid 1800 env KDCC_PALLAS_XMID=1 timeout 1800 python tools/profile_kd.py --what teacher --teacher deeplabv3plus_xception --batch 4 --hw 769 --top 12
echo "=== r4i-matrix done $(date -u) ===" >> "$log"
