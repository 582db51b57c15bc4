#!/bin/bash
# Round-5 TPU measurement batch #2: the landed defaults (proxy_block 1024,
# verify caps (2,4,12), repack f>=32) + the polish-verify A/Bs.
# SEQUENTIAL: exactly one TPU client at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/tpu_r5b}
mkdir -p "$OUT"

echo "== bench at HEAD (r5 defaults landed) =="
timeout 2400 python bench.py --img 512 2>"$OUT/bench1.err" | tee "$OUT/bench1.json"

echo "== polish-verify parity gate (production bar: frontal p95 < 1e-3) =="
timeout 2400 python scripts/diag_polish_parity.py --img 512 \
  2>"$OUT/polish_parity.err" | tee "$OUT/polish_parity.txt"

echo "== bench, verify_hits=polish (single-frame fwd/fwd+bwd are the genuine numbers) =="
timeout 2400 python bench.py --img 512 --verify-hits polish \
  2>"$OUT/bench_polish.err" | tee "$OUT/bench_polish.json"

echo "== bench, polish + 3 Newton iters (verdict-quality/cost A/B) =="
timeout 2400 python bench.py --img 512 --verify-hits polish --polish-iters 3 \
  2>"$OUT/bench_polish3.err" | tee "$OUT/bench_polish3.json"

echo "== decomposition F=64 rounds: full / proxy / polish / noverify =="
timeout 2400 python scripts/diag_proxy.py --img 512 --frames 64 \
  2>"$OUT/proxy64b.err" | tee "$OUT/proxy64b.txt"

echo "== decomposition F=1 queue: full / proxy / polish / noverify =="
timeout 2400 python scripts/diag_proxy.py --img 512 --frames 1 \
  2>"$OUT/proxy1.err" | tee "$OUT/proxy1.txt"

echo "== F=1 queue verify-cap A/B (new default vs old queue caps) =="
timeout 3600 python scripts/diag_verify_caps.py --img 512 --frames 1 \
  --scheduler queue --caps "1,2,6,16|2,4,12|2,6,16" \
  2>"$OUT/vcaps_q1.err" | tee "$OUT/vcaps_q1.txt"

echo "done -> $OUT"
