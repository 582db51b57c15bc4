#!/bin/bash
# Round-5 TPU measurement batch (VERDICT r4 items #1-#5) — the
# measurement-led performance round. SEQUENTIAL: exactly one TPU client
# at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5}
mkdir -p "$OUT"

echo "== bench at HEAD (r5 start baseline) =="
timeout 2400 python bench.py --img 512 2>"$OUT/bench0.err" | tee "$OUT/bench0.json"

echo "== F=1 stage decomposition, proxy path (VERDICT #1) =="
timeout 2400 python scripts/diag_f1_stages.py --img 512 --proxy --modes pallas \
  2>"$OUT/stages.err" | tee "$OUT/stages.txt"

echo "== compose itemization (VERDICT #2) =="
timeout 2400 python scripts/diag_compose.py --img 512 --proxy \
  2>"$OUT/compose.err" | tee "$OUT/compose.txt"

echo "== batched decomposition + residency, F=64 (VERDICT #1) =="
timeout 2400 python scripts/diag_proxy.py --img 512 --frames 64 \
  2>"$OUT/proxy64.err" | tee "$OUT/proxy64.txt"

echo "== verify-cap sweep, F=64 (VERDICT #3a) =="
timeout 3600 python scripts/diag_verify_caps.py --img 512 --frames 64 \
  --caps "4,12|1,3,12|1,2,6,16|2,6,16|2,4,12" \
  2>"$OUT/vcaps.err" | tee "$OUT/vcaps.txt"

echo "== proxy block width sweep, F=64 (VERDICT #3b) =="
timeout 3600 python scripts/diag_proxy_block.py --img 512 --frames 64 \
  --blocks 512,1024,2048 2>"$OUT/pblock.err" | tee "$OUT/pblock.txt"

echo "== repack scale gate (VERDICT #5) =="
timeout 3600 python scripts/diag_repack_scale.py --img 512 --fs 8,32,64 \
  2>"$OUT/repack.err" | tee "$OUT/repack.txt"

echo "== config #5 at stated scale: 1k latents x 16 views @ 512^2 (VERDICT #4) =="
timeout 3600 python -m dist_renderer_tpu.tasks.batched_render \
  --params-npz .bench_decoder.npz --latents 1000 --views 16 --img 512 \
  --fast --pallas --stream --proxy .bench_proxy.npz \
  2>"$OUT/config5.err" | tee "$OUT/config5.json"

echo "done -> $OUT"
