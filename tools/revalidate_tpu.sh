#!/bin/bash
# One-shot on-chip revalidation: run after any round of changes (or a relay
# outage) to re-certify every TPU surface in sequence on an idle box.
#
#   bash tools/revalidate_tpu.sh [logfile]
#
# Order matters: correctness first (selfcheck, driver contracts), then the
# timed benches (headline + density curve) SERIALLY so nothing contends for
# the chip (BENCH.md round-3 measurement-discipline note).

set -u
LOG=${1:-/tmp/revalidate_tpu.log}
cd "$(dirname "$0")/.."
: > "$LOG"

step() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  ("$@" 2>&1; echo "exit=$?") | tee -a "$LOG"
}

step "tpu_selfcheck (all kernels vs references on chip)" \
  timeout 1800 python tools/tpu_selfcheck.py

step "driver contracts (entry + dryrun_multichip)" \
  timeout 1800 python __graft_entry__.py

step "bench: headline (default density, median of 5)" \
  env BENCH_VERBOSE=1 timeout 3600 python bench.py

for d in 500 1000 4000; do
  step "bench: density $d regions/MPix" \
    env BENCH_DENSITY=$d timeout 3600 python bench.py
done

step "bench: 4096^2 mosaic" \
  env BENCH_SCENE=4096 timeout 3600 python bench.py

echo "=== done; full log at $LOG ==="
