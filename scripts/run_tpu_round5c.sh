#!/bin/bash
# Round-5 TPU batch #3: config-#5 throughput forensics + stated-scale rerun.
# The r5 stated-scale run (1k x 16 @ 512^2, chunk=128 host loop) sustained
# 7.22 Mrays/s = 36 ms/frame vs ~17 in the resident-args F=64 bench. The
# A/B separates: per-chunk host dispatch overhead (chunk sweep + --scan),
# shape difficulty from the 0.05-noise latents (--latent-noise 0).
# SEQUENTIAL: exactly one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5c}
mkdir -p "$OUT"
SMALL="--params-npz .bench_decoder.npz --latents 64 --views 16 --img 512 --fast --pallas --stream --proxy .bench_proxy.npz"

echo "== finalize compile isolation + polish/polish-all timings + parity (F=64) =="
timeout 3600 python scripts/diag_finalize_compile.py --img 512 --frames 64 \
  2>"$OUT/fincompile.err" | tee "$OUT/fincompile.txt"

echo "== F=64 decomposition incl. polish-all row =="
timeout 2400 python scripts/diag_proxy.py --img 512 --frames 64 \
  2>"$OUT/proxy64c.err" | tee "$OUT/proxy64c.txt"

echo "== A/B base: 64x16 @ 512^2, chunk=128, host loop (r5 config as measured) =="
timeout 1800 python -m dist_renderer_tpu.tasks.batched_render $SMALL \
  2>"$OUT/ab_base.err" | tee "$OUT/ab_base.json"

echo "== A/B: chunk=64 host loop (per-chunk overhead scales with chunk count?) =="
timeout 1800 python -m dist_renderer_tpu.tasks.batched_render $SMALL --chunk 64 \
  2>"$OUT/ab_c64.err" | tee "$OUT/ab_c64.json"

echo "== A/B: --scan (whole stream in ONE dispatch, chunk=128) =="
timeout 1800 python -m dist_renderer_tpu.tasks.batched_render $SMALL --scan \
  2>"$OUT/ab_scan.err" | tee "$OUT/ab_scan.json"

echo "== A/B: latent-noise 0 (shape difficulty vs machinery, chunk=128 host) =="
timeout 1800 python -m dist_renderer_tpu.tasks.batched_render $SMALL --latent-noise 0.0 \
  2>"$OUT/ab_noise0.err" | tee "$OUT/ab_noise0.json"

echo "== stated scale rerun: 1k x 16 @ 512^2 with the scan path =="
timeout 3600 python -m dist_renderer_tpu.tasks.batched_render \
  --params-npz .bench_decoder.npz --latents 1000 --views 16 --img 512 \
  --fast --pallas --stream --scan --proxy .bench_proxy.npz \
  2>"$OUT/config5_scan.err" | tee "$OUT/config5_scan.json"

echo "done -> $OUT"
