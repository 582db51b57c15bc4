"""Sweep the PROXY-stage Pallas block width in the FULL graph — round-5
item #3b. batched_march.py records 2.00 us/512-lanes at block=2048 vs
2.36 at 512 on uniform work (~15% of the proxy-stage march), but
residency is a max over the block, so wider blocks coarsen the work
grouping; the full-graph verdict was never measured.

The lever reaches: the coarse pyramid levels (both schedulers) and the
proxy fine march under the rounds scheduler (the queue kernel clamps to
the main block — its compaction one-hots scale as block^2 in VMEM).

  python scripts/diag_proxy_block.py --img 512 --frames 64 \
      --blocks 512,1024,2048

Also asserts depth/hit identity across widths (pure scheduling).
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
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--blocks", default="512,1024,2048")
    ap.add_argument("--scheduler", default="auto")
    ap.add_argument("--cpu", action="store_true")
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
    proxy = load_proxy_npz("/root/repo/.bench_proxy.npz")
    meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
    pbo, pband = proxy_march_margins(meta, 2e-3) if meta else (0.015, 0.02)

    img, F = args.img, args.frames
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2,
                            img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    lat = jnp.stack([z0] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(o[None], (1,) + o.shape)
    vb = jnp.broadcast_to(v[None], (1,) + v.shape)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                        coarse_to_fine=True, c2f_strides=(16, 4),
                        c2f_coarse_steps=16, scheduler=args.scheduler)
    interp = jax.default_backend() != "tpu"

    ref = None
    for spec in args.blocks.split(","):
        pblk = int(spec)
        fn = jax.jit(lambda l, o_, v_, pb=pblk: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, interpret=interp,
            scheduler=args.scheduler,
            proxy=proxy, proxy_backoff=pbo, proxy_band=pband,
            proxy_block=None if pb == 512 else pb,
        )[:2])
        d, h = fn(lat, ob, vb)
        float(jnp.sum(d))
        t0 = time.perf_counter()
        for _ in range(3):
            d, h = fn(lat, ob, vb)
        jax.block_until_ready(d)
        float(jnp.sum(d))
        dt = (time.perf_counter() - t0) / 3 / F
        d_np, h_np = np.asarray(d), np.asarray(h)
        if ref is None:
            ref = (d_np, h_np)
            agree = "ref"
        else:
            flips = int((h_np != ref[1]).sum())
            dmax = float(np.abs(np.where(h_np & ref[1],
                                         d_np - ref[0], 0)).max())
            agree = f"flips={flips} dmax={dmax:.1e}"
        print(f"[F={F} proxy_block {pblk:5d}] {dt*1e3:7.2f} ms/frame  "
              f"{F*o.shape[0]/(dt*F)/1e6:6.2f} Mrays/s  "
              f"hits={int(h_np.sum())/F:.0f} {agree}", flush=True)


if __name__ == "__main__":
    main()
