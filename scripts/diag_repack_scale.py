"""Re-measure the difficulty-repack scale dependence (VERDICT r3 #4).

Round 3 measured +5% at F=64 but -10% at F=8-32 (an XLA cross-stage
scheduling interaction with the classification pipeline — isolation-
neutral), so the repack was gated to F>=48. The classify pipeline has
since changed (inter-level state carried at coarse resolution, proxy
stage between classify and the full-decoder work): re-measure at every
production F with the CURRENT pipeline, proxy on and off.

  python scripts/diag_repack_scale.py [--img 512] [--fs 8,32,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--fs", default="8,32,64")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-proxy", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.pretrain import load_params_npz
    from dist_renderer_tpu.models.proxy import (
        load_proxy_meta, load_proxy_npz, proxy_march_margins,
    )
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    dcfg = DecoderConfig()
    params, z0 = load_params_npz("/root/repo/.bench_decoder.npz")
    pkw = {}
    if not args.no_proxy:
        proxy = load_proxy_npz("/root/repo/.bench_proxy.npz")
        meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
        pbo, pband = proxy_march_margins(meta, 2e-3) if meta else (0.015, 0.02)
        pkw = dict(proxy=proxy, proxy_backoff=pbo, proxy_band=pband)

    img = args.img
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True, c2f_strides=(16, 4),
                        c2f_coarse_steps=16)
    interp = jax.default_backend() != "tpu"

    for F in [int(x) for x in args.fs.split(",")]:
        lat = jnp.stack([z0] * F) + 0.001 * jax.random.normal(
            jax.random.PRNGKey(9), (F, dcfg.latent_size))
        ob = jnp.broadcast_to(o[None], (1,) + o.shape)
        vb = jnp.broadcast_to(v[None], (1,) + v.shape)
        base = {}
        for rp in (False, True):
            fn = jax.jit(lambda l, o_, v_, rp=rp: render_batched_c2f(
                params, dcfg, l,
                jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
                jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
                (img, img), march, strides=(16, 4), coarse_steps=16,
                shared_origin=True, interpret=interp,
                difficulty_repack=rp, **pkw,
            )[:2])
            d, h = fn(lat, ob, vb)
            float(jnp.sum(d))
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                d, h = fn(lat, ob, vb)
            jax.block_until_ready(d)
            float(jnp.sum(d))
            dt = (time.perf_counter() - t0) / reps / F
            base[rp] = dt
            print(f"[F={F:3d} repack={int(rp)}] {dt*1e3:7.2f} ms/frame "
                  f"hits={int(np.asarray(h).sum())/F:.0f}", flush=True)
        print(f"[F={F:3d}] repack speedup {base[False]/base[True]:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
