#!/bin/bash
# One-shot TPU measurement batch for the round-3 recompute work.
# Run when the tunnel recovers from the backend-unavailable wedge.
# SEQUENTIAL — exactly one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_meas_$(date +%H%M)}
mkdir -p "$OUT"
echo "== diag_recompute (xla vs pallas in the render graph) =="
timeout 2400 python scripts/diag_recompute.py --img 512 2>"$OUT/recompute.err" | tee "$OUT/recompute.txt"
echo "== diag_f1_stages =="
timeout 2400 python scripts/diag_f1_stages.py --img 512 2>"$OUT/stages.err" | tee "$OUT/stages.txt"
echo "== bench xla =="
timeout 2400 python bench.py --img 512 2>"$OUT/bench_xla.err" | tee "$OUT/bench_xla.json"
echo "== bench pallas =="
timeout 2400 python bench.py --img 512 --recompute pallas 2>"$OUT/bench_pallas.err" | tee "$OUT/bench_pallas.json"
echo "== queue caps / scheduler sweep (post-recompute graph) =="
timeout 2400 python scripts/diag_queue.py 2>"$OUT/queue.err" | tee "$OUT/queue.txt"
echo "== warm-start with pallas recompute (step was recompute-bound; re-check) =="
timeout 2400 python scripts/diag_warm.py --imgs 512 --recompute pallas 2>"$OUT/warm.err" | tee "$OUT/warm.txt"
echo "done -> $OUT"
