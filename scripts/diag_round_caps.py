"""Sweep the rounds-scheduler step caps for the batched pipeline.

Why: block residency in round 0 pins at ~cap for every live block (the
initial class sort is pixel-ordered, so each block holds at least one
straggler; residency is the max over the block's 512 rays). Measured at
F=8 with caps (4,12): verify_r0 = 3957 block-steps/8 frames over ~990
live blocks = ~4.0/block — the cap, not the ray mean (~1.5). A smaller
first cap moves work into the REPACKED rounds, which bin survivors
densely.

  python scripts/diag_round_caps.py [--frames 8] [--caps "4,12;2,12;2,6,18"]
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--caps", default="4,12;2,12;2,6,18;3,12")
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
    proxy = None
    pbo, pband = 0.015, 0.02
    if not args.no_proxy:
        proxy = load_proxy_npz("/root/repo/.bench_proxy.npz")
        meta = load_proxy_meta("/root/repo/.bench_proxy.npz")
        if meta:
            pbo, pband = proxy_march_margins(meta, 2e-3)

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
                        c2f_coarse_steps=16)
    interp = jax.default_backend() != "tpu"

    ref = None
    for caps_s in args.caps.split(";"):
        caps = tuple(int(c) for c in caps_s.split(","))
        fn = jax.jit(lambda l, o_, v_, caps=caps: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, round_caps=caps, scheduler="rounds",
            proxy=proxy, proxy_backoff=pbo, proxy_band=pband,
            interpret=interp,
        )[:2])
        d, h = fn(lat, ob, vb)
        float(jnp.sum(d))
        t0 = time.perf_counter()
        for _ in range(3):
            d, h = fn(lat, ob, vb)
        jax.block_until_ready(d)
        float(jnp.sum(d))
        dt = (time.perf_counter() - t0) / 3 / F
        hits = int(np.asarray(h).sum()) / F
        if ref is None:
            ref = (np.asarray(d), np.asarray(h))
            note = "(ref)"
        else:
            agree = (np.asarray(h) == ref[1]).mean()
            dmax = float(np.abs(np.asarray(d) - ref[0])[
                np.asarray(h) & ref[1]].max()) if (np.asarray(h) & ref[1]).any() else 0.0
            note = f"hit-agree={agree:.5f} d|max|={dmax:.1e}"
        print(f"caps={caps}: {dt*1e3:7.2f} ms/frame  hits={hits:.0f} {note}",
              flush=True)


if __name__ == "__main__":
    main()
