#!/bin/bash
# Round-3b measurement queue (continuation session): confirm the IR
# default flip at HEAD, A/B the pending RNET knob, then the config #3
# Xception matrix. Sequential — the host has one core.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/r3b.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) r3b matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  # pipefail + explicit FAILED marker: without it a crashed bench appends an
  # arbitrary traceback line indistinguishable from a JSON result (ADVICE r3)
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
run +rnet        bench.py KDCC_PALLAS_RNET=1
run x-stock      bench_xception.py KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=0
run x-fuseup     bench_xception.py KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=1
run x-xmid       bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
run x-xmid+fuse  bench_xception.py KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=1
echo "=== done $(date -u) ===" >> "$log"
