#!/bin/bash
# Round-4 measurement queue. The dh-fold (commit a145914) sped up every
# kernel sharing _dw_taps, so re-A/B the knobs that previously lost by
# VPU time (decoder-NW, standalone dw), then the mandatory config #3
# Xception matrix (VERDICT r3 item 4 / BASELINE.md dangling row).
# Sequential — the host has one core.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r4.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r4 matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; bench=$2; shift 2
  echo "--- $name : $* ---" >> "$log"
  set -o pipefail
  if env "$@" timeout 1800 python "$bench" 2>&1 | grep -v WARNING | tail -1 >> "$log"; then
    echo "    [done $name $(date -u +%H:%M:%S)]" >> "$log"
  else
    echo "    [FAILED $name rc=$? $(date -u +%H:%M:%S)]" >> "$log"
  fi
  set +o pipefail
}
run head-default bench.py
run +decnw       bench.py KDCC_PALLAS_DECODER_NW=1
run x-stock      bench_xception.py KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=0
run x-xmid       bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
echo "=== done $(date -u) ===" >> "$log"
