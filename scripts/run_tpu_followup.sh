#!/bin/bash
# Follow-up TPU batch (run AFTER run_tpu_measurements.sh): the
# rim-aggressiveness alpha sweep at the headline frame count.
# SEQUENTIAL — one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_followup}
mkdir -p "$OUT"
echo "== sweep_batched F=64 (headline scale) =="
timeout 2400 python scripts/sweep_batched.py --img 512 --frames 64 --rim-only 2>"$OUT/sweep64.err" | tee "$OUT/sweep64.txt"
echo "done -> $OUT"
