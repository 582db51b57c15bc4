"""Bisect the ~1.5-3 ms per-launch cost of straight-line Mosaic kernels
(diag_launch3: while-loop kernels ~0.03 ms, trivial matmul/roll kernels
~1.6-3 ms). Decide per-dispatch vs per-kernel by nesting 20 copies in one
jit, and finish the work-queue building-block checks (int-iota compaction,
XLA scatter merge).

  python scripts/diag_launch4.py
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


def timeit(fn, *a, n=50):
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


V = pltpu.VMEM
x = jnp.ones((8, 512), jnp.float32)
w = jnp.ones((512, 512), jnp.bfloat16)


def call(kernel, outshape, *args, n_out_rows=8):
    return pl.pallas_call(
        kernel, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=V) for _ in args],
        out_specs=pl.BlockSpec(memory_space=V),
        out_shape=outshape,
    )(*args)


def k_copy(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]


def k_add(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] + 1.0


def k_mm(x_ref, w_ref, o_ref):
    o_ref[:, :] = jax.lax.dot_general(
        x_ref[:, :].astype(jnp.bfloat16), w_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def k_mm_in_while(x_ref, w_ref, o_ref):
    def cond(kc):
        return kc[0] < 1

    def body(kc):
        k, acc = kc
        return k + 1, jax.lax.dot_general(
            x_ref[:, :].astype(jnp.bfloat16), w_ref[:, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    _, acc = jax.lax.while_loop(cond, body, (0, jnp.zeros((8, 512), jnp.float32)))
    o_ref[:, :] = acc


o8 = jax.ShapeDtypeStruct((8, 512), jnp.float32)
p(f"copy kernel:            {timeit(jax.jit(lambda a: call(k_copy, o8, a)), x)*1e3:.3f} ms")
p(f"add kernel:             {timeit(jax.jit(lambda a: call(k_add, o8, a)), x)*1e3:.3f} ms")
p(f"matmul kernel:          {timeit(jax.jit(lambda a, b: call(k_mm, o8, a, b)), x, w)*1e3:.3f} ms")
p(f"matmul-in-while kernel: {timeit(jax.jit(lambda a, b: call(k_mm_in_while, o8, a, b)), x, w)*1e3:.3f} ms")


def chain20(a, b):
    out = a
    for _ in range(20):
        out = call(k_mm, o8, out, b)
    return out


p(f"20 chained matmul kernels in one jit: {timeit(jax.jit(chain20), x, w)*1e3:.3f} ms")


def chain20_xla(a, b):
    out = a
    for _ in range(20):
        out = jax.lax.dot_general(out.astype(jnp.bfloat16), b,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    return out


p(f"20 chained XLA matmuls in one jit:    {timeit(jax.jit(chain20_xla), x, w)*1e3:.3f} ms")

# int-iota one-hot compaction (fixed dtype)
def k_compact(d_ref, pos_ref, surv_ref, out_ref):
    d = d_ref[:, :]
    pos = pos_ref[:, :].astype(jnp.int32)
    surv = surv_ref[:, :]
    jj = jax.lax.broadcasted_iota(jnp.int32, (1024, 512), 0)
    m = jnp.where((pos == jj) & (surv > 0.5), 1.0, 0.0).astype(jnp.bfloat16)
    hi = d.astype(jnp.bfloat16)
    r1 = (d - hi.astype(jnp.float32))
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = None
    for part in (hi, mid, lo):
        r = jax.lax.dot_general(part, m, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = r if acc is None else acc + r
    out_ref[:, :] = acc


d24 = jnp.arange(24 * 512, dtype=jnp.float32).reshape(24, 512) * 0.001 + 1.0
surv = (jnp.arange(512) % 2 == 0).astype(jnp.float32)[None]
pos = (jnp.cumsum(surv[0]) - 1.0)[None] * surv + (1 - surv) * 5000.0
o24 = jax.ShapeDtypeStruct((24, 1024), jnp.float32)
fc = jax.jit(lambda d, p_, s: call(k_compact, o24, d, p_, s))
out = fc(d24, pos, surv)
ok = bool(jnp.all(out[:, :256] == d24[:, ::2]))
p(f"bf16x3 one-hot compaction exact={ok}: {timeit(fc, d24, pos, surv)*1e3:.3f} ms")

# XLA scatter merge cost
N = 512 * 512
tgt = jnp.zeros((8, N), jnp.float32)
for qn in (N // 4, N // 16):
    qpix = (jnp.arange(qn, dtype=jnp.int32) * 3) % N
    qval = jnp.ones((8, qn), jnp.float32)
    fsc = jax.jit(lambda t, i, v: t.at[:, i].set(v, mode="drop"))
    p(f"XLA scatter [8,{qn}] -> [8,N]: {timeit(fsc, tgt, qpix, qval)*1e3:.3f} ms")

# gather for comparison
fga = jax.jit(lambda t, i: t[:, i])
qpix = (jnp.arange(N // 4, dtype=jnp.int32) * 3) % N
p(f"XLA gather [8,N] -> [8,{N//4}]: {timeit(fga, tgt, qpix)*1e3:.3f} ms")
