"""Round-3 launch-tax + glue decomposition (tunneled TPU v5e).

Questions this answers (feeding the launch-merge design,
VERDICT round 2 item 1):

  1. Is the ~2-3 ms scalar-control-flow launch tax CONSTANT in trip count
     (a per-launch fixed cost) or linear (a per-iteration cost)?
  2. Is it additive across launches in one jit (2 kernels = 2x)?
  3. Does an in-kernel fp32 dot_general lower and run (needed for the
     exact one-hot compaction matmul of the planned work-queue kernel)?
  4. Does pltpu.roll work on [rows, N] lane vectors (queue staging shift)?
  5. What do the F=1 sorts actually cost (class sort + repacks + unsort)?
  6. Single-frame trace_frame phase decomposition: coarse launches alone
     vs + fine rounds vs + recompute.

  python scripts/diag_launch2.py [--quick]
"""

import argparse
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


def scalar_while_kernel(nl_ref, out_ref):
    def cond(k):
        return k < nl_ref[0]

    def body(k):
        return k + 1

    jax.lax.while_loop(cond, body, 0)
    out_ref[:, :] = jnp.zeros((8, 128), jnp.float32)


def run_scalar_while(trips):
    f = jax.jit(lambda t: pl.pallas_call(
        scalar_while_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(t))
    t = jnp.array([trips], jnp.int32)
    return timeit(f, t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    p(f"device: {jax.devices()[0]}")

    # ---- 1. trip-count sweep of the bare scalar while ----
    for trips in (0, 1, 64, 1024, 16384):
        p(f"scalar while x{trips}: {run_scalar_while(trips)*1e3:.3f} ms")

    # ---- 2. additivity: two scalar-while kernels in one jit ----
    def two(t):
        a = pl.pallas_call(
            scalar_while_kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(t)
        b = pl.pallas_call(
            scalar_while_kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(t)
        return a + b

    t0 = jnp.array([0], jnp.int32)
    p(f"TWO scalar-while kernels, 0 trips: {timeit(jax.jit(two), t0)*1e3:.3f} ms")

    # ---- 3. vector while (the march shape) 0 vs few iterations ----
    def vec_while_kernel(nl_ref, out_ref):
        def cond(kc):
            k, c = kc
            return (k < nl_ref[0]) & (jnp.max(c) > -1.0)

        def body(kc):
            k, c = kc
            return k + 1, c + 1.0

        _, c = jax.lax.while_loop(cond, body, (0, jnp.zeros((8, 512), jnp.float32)))
        out_ref[:, :] = c

    fv = jax.jit(lambda t: pl.pallas_call(
        vec_while_kernel, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
    )(t))
    for trips in (0, 8):
        t = jnp.array([trips], jnp.int32)
        p(f"vector while x{trips}: {timeit(fv, t)*1e3:.3f} ms")

    # ---- 4. fp32 in-kernel dot_general (one-hot compaction primitive) ----
    def f32dot_kernel(x_ref, m_ref, out_ref):
        out_ref[:, :] = jax.lax.dot_general(
            x_ref[:, :], m_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = jnp.arange(24 * 512, dtype=jnp.float32).reshape(24, 512)
    # one-hot "compact even lanes to the front" matrix [1024, 512]
    pos = jnp.where(jnp.arange(512) % 2 == 0, jnp.arange(512) // 2, 10**6)
    m = (jnp.arange(1024)[:, None] == pos[None, :]).astype(jnp.float32)
    try:
        fdot = jax.jit(lambda x, m: pl.pallas_call(
            f32dot_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((24, 1024), jnp.float32),
        )(x, m))
        out = fdot(x, m)
        expect = jax.lax.dot_general(x, m, (((1,), (1,)), ((), ())))
        err = float(jnp.max(jnp.abs(out - expect)))
        exact = bool(jnp.all(out[:, :256] == x[:, ::2]))
        p(f"fp32 in-kernel dot [24,512]x[1024,512]^T: OK err={err:.3e} "
          f"one-hot-exact={exact} {timeit(fdot, x, m)*1e3:.3f} ms")
    except Exception as e:
        p(f"fp32 in-kernel dot FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- 5. pltpu.roll on [rows, lanes] (queue staging shift) ----
    def roll_kernel(x_ref, out_ref):
        out_ref[:, :] = pltpu.roll(x_ref[:, :], -512, 1)

    xr = jnp.arange(24 * 1024, dtype=jnp.float32).reshape(24, 1024)
    try:
        froll = jax.jit(lambda x: pl.pallas_call(
            roll_kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((24, 1024), jnp.float32),
        )(x))
        out = froll(xr)
        ok = bool(jnp.all(out[:, :512] == xr[:, 512:]))
        p(f"pltpu.roll(-512, lanes): OK match={ok} {timeit(froll, xr)*1e3:.3f} ms")
    except Exception as e:
        p(f"pltpu.roll FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- 6. cumsum via log-shift rolls on [1, 512] (compaction pos) ----
    def cumsum_kernel(x_ref, out_ref):
        c = x_ref[:, :]
        for sh in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            r = pltpu.roll(c, sh, 1)
            mask = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1) >= sh
            c = c + jnp.where(mask, r, 0.0)
        out_ref[:, :] = c

    xs = (jnp.arange(512, dtype=jnp.float32) % 3 == 0).astype(jnp.float32)[None]
    try:
        fcs = jax.jit(lambda x: pl.pallas_call(
            cumsum_kernel, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
        )(x))
        out = fcs(xs)
        ok = bool(jnp.all(out == jnp.cumsum(xs[0])[None]))
        p(f"in-kernel roll-cumsum [1,512]: OK match={ok} {timeit(fcs, xs)*1e3:.3f} ms")
    except Exception as e:
        p(f"roll-cumsum FAILED: {type(e).__name__}: {str(e)[:200]}")

    if args.quick:
        return

    # ---- 7. F=1 sort costs at 512^2 ----
    k = jnp.zeros((1, N), jnp.int32)
    pays = [jnp.zeros((1, N), jnp.float32) for _ in range(10)]
    fsort = jax.jit(lambda k, *ps: jax.lax.sort(
        (k,) + ps, dimension=1, num_keys=1, is_stable=True))
    p(f"lax.sort [1,262k] x 10 payloads: {timeit(fsort, k, *pays)*1e3:.3f} ms")
    k3 = jnp.zeros((1, N // 3), jnp.int32)
    pays3 = [jnp.zeros((1, N // 3), jnp.float32) for _ in range(10)]
    p(f"lax.sort [1,87k] x 10 payloads: {timeit(fsort, k3, *pays3)*1e3:.3f} ms")

    # ---- 8. trace_frame phase decomposition ----
    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import (
        batched_trace_padded, fold_bias_bank, pack_shared, render_batched_c2f,
    )

    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    params, latent = get_or_fit_cached(
        "/root/repo/.bench_decoder.npz", lambda p: shape(None, p), dcfg, steps=1500)
    img = 512
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                       coarse_to_fine=True, c2f_strides=(16, 4),
                       c2f_coarse_steps=16)
    shared = pack_shared(params, dcfg)
    bank = fold_bias_bank(params, latent[None], dcfg, shared)

    import dataclasses as _dc
    coarse16 = _dc.replace(march, max_steps=16)

    # coarse levels only (both strides, seeded like production)
    def coarse_only(o, v):
        o_g = o.reshape(1, img, img, 3)
        v_g = v.reshape(1, img, img, 3)
        o16 = o_g[:, ::16, ::16].reshape(1, -1, 3)
        v16 = v_g[:, ::16, ::16].reshape(1, -1, 3)
        r16 = batched_trace_padded(
            shared, bank, o16, v16, coarse16, None,
            jnp.ones((1, o16.shape[1]), bool), 512, False, True)
        o4 = o_g[:, ::4, ::4].reshape(1, -1, 3)
        v4 = v_g[:, ::4, ::4].reshape(1, -1, 3)
        r4 = batched_trace_padded(
            shared, bank, o4, v4, coarse16, None,
            jnp.ones((1, o4.shape[1]), bool), 512, False, True)
        return r16.depth, r4.depth

    ob = o[None]
    vb = v[None]
    f_coarse = jax.jit(lambda o, v: coarse_only(o[0], v[0]))
    p(f"F=1 coarse launches only (16+4, unseeded): {timeit(f_coarse, ob, vb)*1e3:.2f} ms")

    f_full = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march, shared_origin=True))
    p(f"F=1 render_batched_c2f fwd: {timeit(f_full, latent[None], ob, vb)*1e3:.2f} ms")

    f_full_d = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march, shared_origin=True,
        return_anchor=True, return_steps=True, return_last=True))
    p(f"F=1 render_batched_c2f fwd (+anchor/steps/last payloads): "
      f"{timeit(f_full_d, latent[None], ob, vb)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
