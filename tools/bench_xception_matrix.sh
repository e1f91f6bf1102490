#!/bin/bash
# Config #3 (Xception-65 @769², BASELINE.json:9) A/B matrix for the
# round-3 Xception kernels. Run on the real TPU after tools/bench_matrix.sh.
# Results append to ${1:-/tmp/measure/xception.log}.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/xception.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) xception matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; shift
  echo "--- $name : $* ---" >> "$log"
  env "$@" timeout 2400 python bench_xception.py 2>&1 | grep -v WARNING | tail -1 >> "$log"
}
run stock      KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=0
run +fuseup    KDCC_PALLAS_XMID=0 KDCC_FUSE_UPSAMPLE=1
run +xmid      KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=0
run xmid+fuse  KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=1
run +s2d       KDCC_PALLAS_XMID=1 KDCC_FUSE_UPSAMPLE=1 KDCC_S2D_STEM=1
echo "=== done $(date -u) ===" >> "$log"
