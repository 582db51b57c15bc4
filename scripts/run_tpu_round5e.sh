#!/bin/bash
# Round-5 TPU batch #5: the polish-all decision set, with the per-frame
# host-loop finalize (the only finalize structure that compiles on this
# service — r5 batches #2-#4).
#   1. 512^2 F=64 combined timing + parity vs march-verify (the flip/
#      depth-delta gate for flipping the bench batched default)
#   2. bench --verify-hits polish-all (the candidate headline)
#   3. bench --verify-hits polish (march-band variant, same structure)
# SEQUENTIAL: exactly one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5e}
mkdir -p "$OUT"

echo "== combined polish-all timing + parity at 512^2 F=64 =="
timeout 3600 python scripts/diag_finalize_compile.py --img 512 --frames 64 \
  --skip finalize,trace,combined \
  2>"$OUT/pall64.err" | tee "$OUT/pall64.txt"

echo "== bench polish-all (host-loop finalize headline) =="
timeout 3600 python bench.py --img 512 --verify-hits polish-all \
  2>"$OUT/bench_pall2.err" | tee "$OUT/bench_pall2.json"

echo "== bench polish (host-loop finalize headline, band re-march kept) =="
timeout 2400 python bench.py --img 512 --verify-hits polish \
  2>"$OUT/bench_pol2.err" | tee "$OUT/bench_pol2.json"

echo "done -> $OUT"
