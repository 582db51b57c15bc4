"""Sweep the VERIFY stage's round-cap schedule (render_batched_c2f
verify_round_caps — pure scheduling, results bit-identical).

The verify stage's per-ray step distribution is bimodal: seeded proxy
hits converge in ~2-3 full-decoder steps, band/unres rays march long.
Block residency is a MAX over 512 lanes, so the main march's (4, 12)
schedule pins every seeded-hit block at 4 steps where the lane mean is
~2.5 (verify_fine_r0 residency 3879/8 frames at 512^2 —
scripts/diag_proxy.py). Early tiny caps repack the short-tail rays out
before they pay straggler residency; this sweeps the tradeoff against
the repack-sort glue each extra round adds.

  python scripts/diag_verify_caps.py --img 512 --frames 8 \
      --caps "4,12|2,6,16|2,4,12|3,8,24|6,16"

Also asserts depth/hit bit-identity across schedules (the march carry is
Markov; caps must not change results).
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
    ap.add_argument("--caps", default="4,12|2,6,16|2,4,12|3,8,24")
    ap.add_argument("--backoffs", default=None,
                    help="comma list of proxy_backoff values to cross with "
                         "--caps (default: the meta-derived backoff only). "
                         "0 = seed the hit-verify AT the proxy depth: the "
                         "march body's |f|<eps test accepts ~55%% of hits "
                         "at eval 1 (proxy field err p50 1.2e-3 < eps "
                         "2e-3), so a cap-1 round 0 + repack stops paying "
                         "residency-max on already-converged lanes")
    ap.add_argument("--scheduler", default="rounds",
                    help="rounds (batched production) / auto (queue at "
                         "F=1 — verify_round_caps feeds the verify "
                         "queue's gen_caps there) / queue")
    ap.add_argument("--queue-caps", default=None,
                    help="override the MAIN proxy-stage queue gen-cap "
                         "schedule (F=1 queue scheduler), e.g. '2,6,16'")
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
                        c2f_coarse_steps=16)
    interp = jax.default_backend() != "tpu"

    backoffs = ([float(b) for b in args.backoffs.split(",")]
                if args.backoffs else [pbo])
    ref = None
    for bo in backoffs:
      for spec in args.caps.split("|"):
        vcaps = tuple(int(c) for c in spec.split(","))
        fn = jax.jit(lambda l, o_, v_, vc=vcaps, bo=bo: render_batched_c2f(
            params, dcfg, l,
            jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
            jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
            (img, img), march, strides=(16, 4), coarse_steps=16,
            shared_origin=True, interpret=interp,
            proxy=proxy, proxy_backoff=bo, proxy_band=pband,
            verify_mode="march", verify_round_caps=vc,
            verify_gen_caps=vc,  # queue sweeps: the verify stage's gen
                                 # caps are a separate knob as of r5
            scheduler=args.scheduler,
            **({"queue_caps": tuple(int(c) for c in
                                    args.queue_caps.split(","))}
               if args.queue_caps else {}),
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
            dmax = float(np.abs(np.where(h_np & ref[1], d_np - ref[0], 0)).max())
            agree = f"flips={flips} dmax={dmax:.1e}"
        print(f"[bo {bo:.4f} vcaps {spec:>9s}] {dt*1e3:7.2f} ms/frame "
              f"hits={int(h_np.sum())/F:.0f} {agree}", flush=True)


if __name__ == "__main__":
    main()
