"""Per-launch fixed-cost decomposition for Mosaic kernels (tunneled TPU).

Finding (2026-08-17, v5e via axon tunnel): a pallas kernel containing ANY
scalar control flow (lax.while_loop OR a static fori_loop + pl.when) pays
~2-3 ms per LAUNCH even when the loop executes zero iterations; loop-free
kernels pay ~0.02 ms. Weights/aliasing/ANY-memory inputs are all free.
With 5 kernel launches per batched render, that's ~10-15 ms of
irreducible launch tax — the reason 64-frame launches beat 8-frame ones
and a hard floor on single-frame latency until launches are merged.

  python scripts/diag_launch_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here
    (block_until_ready no-ops until the first fetch, docs/PERFORMANCE.md)."""
    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(jnp.sum(x))


def timeit(fn, *a, n=20):
    out = fn(*a); jax.block_until_ready(out); _sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    return (time.perf_counter()-t0)/n

N = 512*512
x8 = jnp.zeros((8, N), jnp.float32)
x16 = jnp.zeros((16, N), jnp.float32)

# 1: trivial non-pallas op at this size (baseline dispatch)
f = jax.jit(lambda a: a + 1.0)
print(f"jit elementwise [8,N]: {timeit(f, x8)*1e3:.2f} ms", flush=True)

# 2: empty pallas, grid=(1,), VMEM-block-free (ANY in/out, no DMA)
def k_empty(in_ref, out_ref):
    pass
f = jax.jit(lambda a: pl.pallas_call(
    k_empty,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
)(a))
print(f"empty pallas ANY->ANY [8,N]: {timeit(f, x8)*1e3:.2f} ms", flush=True)

# 3: same + input_output_aliases (defaults pattern)
f = jax.jit(lambda a: pl.pallas_call(
    k_empty,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={0: 0},
)(a))
print(f"empty pallas ALIASED [8,N]: {timeit(f, x8)*1e3:.2f} ms", flush=True)

# 4: pallas with one [16,N] ANY input + scratch + sem (persistent shape, no loop)
def k_scratch(a_ref, b_ref, out_ref, rv, ov, sem):
    pass
f = jax.jit(lambda a, b: pl.pallas_call(
    k_scratch,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={1: 0},
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                    pltpu.VMEM((8, 512), jnp.float32),
                    pltpu.SemaphoreType.DMA(())],
)(a, b))
print(f"empty pallas + scratch/sem [16,N]+[8,N]: {timeit(f, x16, x8)*1e3:.2f} ms", flush=True)

# 5: the REAL persistent kernel with an empty live list (isolated from host prep)
from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.pretrain import get_or_fit_cached
from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
from dist_renderer_tpu.ops.pallas.batched_march import fold_bias_bank, pack_shared
from dist_renderer_tpu.ops.pallas.batched_march import _make_persistent_kernel, FRAME_TILE, _round_up
dcfg = DecoderConfig()
shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
params, latent = get_or_fit_cached("/root/repo/.bench_decoder.npz", lambda p: shape(None,p), dcfg, steps=1500)
shared = pack_shared(params, dcfg)
bank = fold_bias_bank(params, latent[None], dcfg, shared)
m = MarchConfig(max_steps=32)
n_chunks = N // 512
weights = []
for wh, wx in zip(shared.whT, shared.wxT):
    if wh is not None: weights.append(wh)
    if wx is not None: weights.append(wx)
kern = _make_persistent_kernel(shared, m, 32, True, 512, n_chunks)
nc_pad = _round_up(n_chunks, FRAME_TILE)
bias_cols = jnp.zeros((shared.total, nc_pad), jnp.float32)
live_idx = jnp.zeros((n_chunks,), jnp.int32)
n_live = jnp.zeros((1,), jnp.int32)
def run(rays, defaults, bias_cols, live_idx, n_live, *ws):
    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ws],
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        input_output_aliases={4 + len(ws): 0},
        scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                        pltpu.VMEM((8, 512), jnp.float32),
                        pltpu.VMEM((shared.total, FRAME_TILE), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )(live_idx, n_live, rays, bias_cols, *ws, defaults)
f = jax.jit(lambda rays, defaults: run(rays, defaults, bias_cols, live_idx, n_live, *weights))
print(f"REAL persistent kernel, 0 live chunks: {timeit(f, x16, x8)*1e3:.2f} ms", flush=True)

# 6: same but weights as jit ARGUMENTS (not closure constants)
f2 = jax.jit(lambda rays, defaults, bc, li, nl, *ws: run(rays, defaults, bc, li, nl, *ws))
print(f"REAL persistent kernel, 0 live, weights-as-args: "
      f"{timeit(f2, x16, x8, bias_cols, live_idx, n_live, *weights)*1e3:.2f} ms", flush=True)

# 7: 0-live with while-loop removed? measure the loop machinery alone:
# n_live=0 while_loop exits immediately -> measured above. Compare a
# kernel WITHOUT weights inputs at all:
def k_noW(live_ref, nl_ref, rays_hbm, bias_hbm, defaults, out_hbm, rv, ov, bv, ts, s1, s2, s3):
    def cond(k): return k < nl_ref[0]
    def body(k): return k + 1
    jax.lax.while_loop(cond, body, 0)
f3 = jax.jit(lambda rays, defaults: pl.pallas_call(
    k_noW, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={4: 0},
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                    pltpu.VMEM((8, 512), jnp.float32),
                    pltpu.VMEM((shared.total, FRAME_TILE), jnp.float32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(())],
)(live_idx, n_live, rays, bias_cols, defaults))
print(f"no-weights kernel, scalar while only: {timeit(f3, x16, x8)*1e3:.2f} ms", flush=True)

# 8: static fori + when guard instead of while (zero actual work)
def k_fori(live_ref, nl_ref, rays_hbm, bias_hbm, defaults, out_hbm, rv, ov, bv, ts, s1, s2, s3):
    def body(k, c):
        @pl.when(k < nl_ref[0])
        def _():
            ts[0] = live_ref[k]
        return c
    jax.lax.fori_loop(0, n_chunks, body, 0)
f4 = jax.jit(lambda rays, defaults: pl.pallas_call(
    k_fori, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={4: 0},
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                    pltpu.VMEM((8, 512), jnp.float32),
                    pltpu.VMEM((shared.total, FRAME_TILE), jnp.float32),
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(())],
)(live_idx, n_live, rays, bias_cols, defaults))
print(f"static fori({n_chunks}) + when, 0 live: {timeit(f4, x16, x8)*1e3:.2f} ms", flush=True)

# 9: bare scalar while with a PLAIN VMEM output (no ANY/alias) — isolate
def k_w2(nl_ref, out_ref):
    def cond(k): return k < nl_ref[0]
    def body(k): return k + 1
    jax.lax.while_loop(cond, body, 0)
    out_ref[:, :] = jnp.zeros((8, 128), jnp.float32)
f5 = jax.jit(lambda: pl.pallas_call(
    k_w2, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(n_live))
print(f"bare scalar while, tiny VMEM out: {timeit(f5)*1e3:.2f} ms", flush=True)
