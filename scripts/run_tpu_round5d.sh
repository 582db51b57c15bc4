#!/bin/bash
# Round-5 TPU batch #4: the lax.map finalize compile question (batch #3's
# proxy64c raced the ff7e3fa commit and still ran the vmapped finalize),
# the polish-all batched headline + parity at 512^2, and the F=1
# decomposition retry with a longer budget.
# SEQUENTIAL: exactly one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5d}
mkdir -p "$OUT"

echo "== finalize isolation (lax.map finalize; skip trace-alone, already measured) =="
timeout 3600 python scripts/diag_finalize_compile.py --img 512 --frames 64 \
  --skip trace \
  2>"$OUT/fincompile2.err" | tee "$OUT/fincompile2.txt"

echo "== bench --verify-hits polish-all (batched headline = trace+finalize) =="
timeout 3600 python bench.py --img 512 --verify-hits polish-all \
  2>"$OUT/bench_pall.err" | tee "$OUT/bench_pall.json"

echo "== config #5 stated scale, well-conditioned latents (noise 0.005, host loop) =="
# the r5c A/B isolated the 7.2-vs-17 ms/frame gap to the 0.05-noise
# latents themselves (degenerate far-from-training fields march 2.4x
# slower at 3x fewer hits; noise 0 -> 10.02 Mrays/s); --scan measured
# NEGATIVE (4.71 vs 7.24 — XLA schedules the pallas pipeline worse
# inside lax.map than the async host loop). 0.005 keeps per-frame shape
# variety at the scale the proxy was distilled for.
timeout 3600 python -m dist_renderer_tpu.tasks.batched_render \
  --params-npz .bench_decoder.npz --latents 1000 --views 16 --img 512 \
  --fast --pallas --stream --proxy .bench_proxy.npz --latent-noise 0.005 \
  2>"$OUT/config5_n005.err" | tee "$OUT/config5_n005.json"

echo "== F=1 decomposition retry (full/proxy/polish/finalize/noverify, queue) =="
timeout 3600 python scripts/diag_proxy.py --img 512 --frames 1 \
  2>"$OUT/proxy1.err" | tee "$OUT/proxy1.txt"

echo "done -> $OUT"
