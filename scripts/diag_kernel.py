"""Pure-kernel cost decomposition: us/block-step and dead-block overhead.

Forces every block to run an exact step count (convergence impossible /
everything inactive) so wall time divides cleanly by block-steps.

  python scripts/diag_kernel.py
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here."""
    import jax.numpy as _jnp

    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(_jnp.sum(x))


def timeit(fn, *a, n=5):
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


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.folded import fold_latent
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.fused_march import (
        pack_folded, pallas_sphere_trace,
    )
    from dist_renderer_tpu.ops.pallas.batched_march import (
        fold_bias_bank, pack_shared, pallas_sphere_trace_batched,
    )

    img = 512
    n = img * img
    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_decoder.npz")
    params, latent = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg, steps=1500)
    packed = pack_folded(fold_latent(params, latent, dcfg), dcfg)
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)

    STEPS = 32
    # impossible convergence: every active block runs exactly STEPS steps
    hard = MarchConfig(max_steps=STEPS, convergence_eps=0.0, depth_eps=0.0,
                       far_margin=100.0)

    for block in (512, 1024):
        f = jax.jit(lambda o, v: pallas_sphere_trace(
            packed, o, v, hard, block=block).depth)
        t = timeit(f, o, v)
        blocks = n // block
        us = t * 1e6 / (blocks * STEPS)
        print(f"single-frame kernel block={block}: {t*1e3:.1f} ms for "
              f"{blocks}x{STEPS} block-steps -> {us:.2f} us/block-step "
              f"({512 / block * us:.2f} normalized to 512 lanes)")

    # dead blocks: nothing active -> measures per-block fixed overhead
    for block in (512, 1024):
        f = jax.jit(lambda o, v: pallas_sphere_trace(
            packed, o, v, hard, block=block,
            init_active=jnp.zeros((n,), bool)).depth)
        t = timeit(f, o, v)
        blocks = n // block
        print(f"dead blocks block={block}: {t*1e3:.2f} ms for {blocks} "
              f"blocks -> {t*1e6/blocks:.2f} us/block")

    # batched kernel (bias bank indirection cost)
    F = 8
    shared = pack_shared(params, dcfg)
    lats = jnp.stack([latent] * F)
    bank = fold_bias_bank(params, lats, dcfg, shared)
    frame_of_ray = jnp.repeat(jnp.arange(F, dtype=jnp.int32), n // F)
    f = jax.jit(lambda o, v: pallas_sphere_trace_batched(
        shared, bank, frame_of_ray, o, v, hard).depth)
    t = timeit(f, o, v)
    blocks = n // 512
    print(f"batched kernel block=512: {t*1e3:.1f} ms for {blocks}x{STEPS} "
          f"block-steps -> {t*1e6/(blocks*STEPS):.2f} us/block-step")


if __name__ == "__main__":
    main()
