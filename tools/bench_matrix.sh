#!/bin/bash
# Round-3 A/B measurement matrix for the opt-in kernels. Run on the real
# TPU (env default). Each bench.py invocation is compile-bound (~8-15 min
# on the 1-core host). Results append to ${1:-/tmp/measure/results.log}.
cd "$(dirname "$0")/.."
log=${1:-/tmp/measure/results.log}
mkdir -p "$(dirname "$log")"
echo "=== $(date -u) bench matrix @ $(git rev-parse --short HEAD) ===" >> "$log"
run() {
  name=$1; shift
  echo "--- $name : $* ---" >> "$log"
  env "$@" timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -1 >> "$log"
}
run baseline      KDCC_PALLAS_IR=0 KDCC_PALLAS_DECODER_NW=0
run ir            KDCC_PALLAS_IR=1 KDCC_PALLAS_DECODER_NW=0
run decnw         KDCC_PALLAS_IR=0 KDCC_PALLAS_DECODER_NW=1
run ir+decnw      KDCC_PALLAS_IR=1 KDCC_PALLAS_DECODER_NW=1
run +s2d          KDCC_PALLAS_IR=1 KDCC_PALLAS_DECODER_NW=1 KDCC_S2D_STEM=1
run +rnet         KDCC_PALLAS_IR=1 KDCC_PALLAS_DECODER_NW=1 KDCC_S2D_STEM=1 KDCC_PALLAS_RNET=1
echo "=== done $(date -u) ===" >> "$log"
