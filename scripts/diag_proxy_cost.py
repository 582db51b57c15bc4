"""Per-block-step cost of the PROXY decoder kernel vs the full decoder.

Forces exact step counts (impossible convergence) so wall time divides by
block-steps — answers whether a 4x256 proxy block-step is actually ~8x
cheaper on hardware or floored by per-iteration Mosaic machinery, and
which block size the proxy wants (wider lanes amortize fixed per-step
cost when the matmuls are small).

  python scripts/diag_proxy_cost.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(jnp.sum(x))


def timeit(fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.pretrain import load_params_npz
    from dist_renderer_tpu.models.proxy import load_proxy_npz
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import (
        fold_bias_bank, pack_shared, pallas_sphere_trace_batched,
    )

    img = 512
    n = img * img
    dcfg = DecoderConfig()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, latent = load_params_npz(os.path.join(root, ".bench_decoder.npz"))
    proxy, pcfg = load_proxy_npz(os.path.join(root, ".bench_proxy.npz"))
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)

    STEPS = 32
    hard = MarchConfig(max_steps=STEPS, convergence_eps=0.0, depth_eps=0.0,
                       far_margin=100.0)

    for tag, (pp, cc) in (("full 8x512", (params, dcfg)),
                          ("proxy", (proxy, pcfg))):
        shared = pack_shared(pp, cc)
        bank = fold_bias_bank(pp, latent[None], cc, shared)
        frame_of_ray = jnp.zeros((n,), jnp.int32)
        for block in (512, 1024, 2048):
            try:
                f = jax.jit(lambda o, v: pallas_sphere_trace_batched(
                    shared, bank, frame_of_ray, o, v, hard,
                    block=block).depth)
                t = timeit(f, o, v)
            except Exception as e:
                print(f"{tag} block={block}: FAILED {type(e).__name__}")
                continue
            blocks = n // block
            us = t * 1e6 / (blocks * STEPS)
            print(f"{tag} block={block}: {t*1e3:6.1f} ms for {blocks}x{STEPS}"
                  f" block-steps -> {us:6.2f} us/block-step"
                  f" ({us * 512 / block:6.2f} per 512 lanes)", flush=True)


if __name__ == "__main__":
    main()
