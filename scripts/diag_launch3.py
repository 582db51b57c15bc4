"""Isolate the REAL trigger of the ~2-3 ms persistent-kernel launch cost
(round-2's 'scalar control flow tax' attribution was WRONG: diag_launch2
measured bare scalar/vector while loops at 0.03 ms). Candidates: ANY-memory
operands, input_output_aliases, DMA scratch/semaphores, SMEM arrays, and
their combinations — plus the building blocks the work-queue kernel needs
(bf16 triangular-matmul cumsum, one-hot compaction, scatter merge cost).

  python scripts/diag_launch3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here."""
    import jax.numpy as _jnp

    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(_jnp.sum(x))


def timeit(fn, *a, n=20):
    # hard host-fetch syncs: block_until_ready is a silent no-op until
    # the process's first device->host fetch (docs/PERFORMANCE.md)
    out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    return (time.perf_counter() - t0) / n


def p(msg):
    print(msg, flush=True)


N = 512 * 512
x16 = jnp.zeros((16, N), jnp.float32)
x8 = jnp.zeros((8, N), jnp.float32)
nl0 = jnp.zeros((1,), jnp.int32)
idx512 = jnp.zeros((512,), jnp.int32)


def scalar_while(nl_ref):
    def cond(k):
        return k < nl_ref[0]

    def body(k):
        return k + 1

    jax.lax.while_loop(cond, body, 0)


# ---- combination ladder: while + {ANY, alias, scratch, SMEM array} ----
def k_any(nl_ref, rays, out_ref):
    scalar_while(nl_ref)


f = jax.jit(lambda t, r: pl.pallas_call(
    k_any, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
)(t, r))
p(f"while + ANY in/out: {timeit(f, nl0, x16)*1e3:.3f} ms")


def k_alias(nl_ref, rays, dflt, out_ref):
    scalar_while(nl_ref)


f = jax.jit(lambda t, r, d: pl.pallas_call(
    k_alias, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={2: 0},
)(t, r, d))
p(f"while + ANY + alias: {timeit(f, nl0, x16, x8)*1e3:.3f} ms")


def k_scratch(nl_ref, rays, dflt, out_ref, rv, ov, s1, s2):
    scalar_while(nl_ref)


f = jax.jit(lambda t, r, d: pl.pallas_call(
    k_scratch, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={2: 0},
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                    pltpu.VMEM((8, 512), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(())],
)(t, r, d))
p(f"while + ANY + alias + scratch/sems: {timeit(f, nl0, x16, x8)*1e3:.3f} ms")


def k_smemarr(li_ref, nl_ref, rays, dflt, out_ref):
    def cond(k):
        return k < nl_ref[0]

    def body(k):
        return k + li_ref[k] * 0 + 1

    jax.lax.while_loop(cond, body, 0)


f = jax.jit(lambda li, t, r, d: pl.pallas_call(
    k_smemarr, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={3: 0},
)(li, t, r, d))
p(f"while + SMEM[512] array + ANY + alias: {timeit(f, idx512, nl0, x16, x8)*1e3:.3f} ms")


# ---- one DMA inside the loop (1 trip) ----
def k_dma(nl_ref, rays, dflt, out_ref, rv, ov, s1, s2):
    def cond(k):
        return k < nl_ref[0]

    def body(k):
        cin = pltpu.make_async_copy(rays.at[:, pl.ds(0, 512)], rv, s1)
        cin.start()
        cin.wait()
        ov[:, :] = rv[:8, :] + 1.0
        cout = pltpu.make_async_copy(ov, out_ref.at[:, pl.ds(0, 512)], s2)
        cout.start()
        cout.wait()
        return k + 1

    jax.lax.while_loop(cond, body, 0)


fdma = jax.jit(lambda t, r, d: pl.pallas_call(
    k_dma, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    input_output_aliases={2: 0},
    scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                    pltpu.VMEM((8, 512), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(())],
)(t, r, d))
for trips in (0, 1, 64):
    t = jnp.array([trips], jnp.int32)
    p(f"while + DMA body x{trips}: {timeit(fdma, t, x16, x8)*1e3:.3f} ms")


# ---- building blocks ----
# triangular-matmul cumsum (bf16 inputs, f32 accum): exact counts to 512
def k_tri(x_ref, tri_ref, out_ref):
    pos = jax.lax.dot_general(
        x_ref[:, :], tri_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:, :] = pos


xs = (jnp.arange(512) % 3 == 0).astype(jnp.bfloat16)[None]
tri = (jnp.arange(512)[:, None] <= jnp.arange(512)[None, :]).astype(jnp.bfloat16)
ftri = jax.jit(lambda x, t: pl.pallas_call(
    k_tri, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
)(x, t))
out = ftri(xs, tri)
ok = bool(jnp.all(out[0] == jnp.cumsum(xs[0].astype(jnp.float32))))
p(f"bf16 triangular-matmul cumsum: match={ok} {timeit(ftri, xs, tri)*1e3:.3f} ms")

# bf16 one-hot compaction matmul (exact via bf16x3 data split)
def k_compact(d_ref, pos_ref, surv_ref, out_ref):
    d = d_ref[:, :]                       # [24, 512] f32
    pos = pos_ref[:, :]                   # [1, 512] f32 (target slots)
    surv = surv_ref[:, :]                 # [1, 512] f32 0/1
    jj = jax.lax.broadcasted_iota(jnp.float32, (1024, 512), 0)
    m = jnp.where((pos == jj) & (surv > 0.5), 1.0, 0.0).astype(jnp.bfloat16)
    hi = d.astype(jnp.bfloat16)
    mid = (d - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lo = (d - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = None
    for part in (hi, mid, lo):
        r = jax.lax.dot_general(
            part, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = r if acc is None else acc + r
    out_ref[:, :] = acc


d24 = jnp.arange(24 * 512, dtype=jnp.float32).reshape(24, 512) * 0.001 + 1.0
surv = (jnp.arange(512) % 2 == 0).astype(jnp.float32)[None]
pos = (jnp.cumsum(surv[0]) - 1.0)[None] * surv + (1 - surv) * 5000.0
fc = jax.jit(lambda d, p_, s: pl.pallas_call(
    k_compact, grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((24, 1024), jnp.float32),
)(d, p_, s))
out = fc(d24, pos, surv)
expect = d24[:, ::2]
ok = bool(jnp.all(out[:, :256] == expect))
p(f"bf16x3 one-hot compaction [24,512]->[24,1024]: exact={ok} "
  f"{timeit(fc, d24, pos, surv)*1e3:.3f} ms")

# XLA scatter merge cost (queue results -> full frame)
tgt = jnp.zeros((8, N), jnp.float32)
qn = N // 4
qpix = jnp.arange(qn, dtype=jnp.int32) * 3 % N
qval = jnp.ones((8, qn), jnp.float32)
fsc = jax.jit(lambda t, i, v: t.at[:, i].set(v, mode="drop"))
p(f"XLA scatter [8,{qn}] -> [8,N]: {timeit(fsc, tgt, qpix, qval)*1e3:.3f} ms")
qn2 = N // 16
fsc2 = jax.jit(lambda t, i, v: t.at[:, i].set(v, mode="drop"))
p(f"XLA scatter [8,{qn2}] -> [8,N]: "
  f"{timeit(fsc2, tgt, qpix[:qn2], qval[:, :qn2])*1e3:.3f} ms")

# where-merge via one sorted mask instead of scatter (alternative)
mask = jnp.zeros((N,), bool)
fwm = jax.jit(lambda t, m, v: jnp.where(m[None], v, t))
p(f"XLA where-merge [8,N]: {timeit(fwm, tgt, mask, tgt)*1e3:.3f} ms")
