"""Benchmark harness — the BASELINE.json headline metric.

Measures forward sphere-traced throughput (Mrays/s) for the DeepSDF-8L
decoder at 512^2 on the available accelerator, plus fwd+bwd latency.
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

vs_baseline is value / 50 (the BASELINE.json north-star >= 50 Mrays/s on
one v5e chip). Run on the real TPU (default platform); CPU runs are for
smoke-testing only (--cpu).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--backward", action="store_true", default=True)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.models.decoder import decoder_apply, init_decoder_params
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import render_rays
    from dist_renderer_tpu.utils.losses import masked_l1

    img = args.img
    dcfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), dcfg)
    cfg = RenderConfig(
        img_h=img, img_w=img,
        march=MarchConfig(max_steps=args.steps),
        compute_dtype="bfloat16",
    )
    sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg, cfg.dtype)

    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img))
    origins, dirs = pixel_rays(cam, img, img)
    n_rays = origins.shape[0]

    @jax.jit
    def fwd(latent):
        out = render_rays(sdf_fn, latent, origins, dirs, cfg)
        return out.depth, out.min_sdf

    target = jnp.full((n_rays,), 1.5)
    mask = jnp.ones((n_rays,), bool)

    @jax.jit
    def fwdbwd(latent):
        def loss(z):
            out = render_rays(sdf_fn, z, origins, dirs, cfg)
            return masked_l1(out.depth, target, mask)

        l, g = jax.value_and_grad(loss)(latent)
        return l, g

    latents = [
        jax.random.normal(jax.random.PRNGKey(i), (dcfg.latent_size,)) * 0.1
        for i in range(args.frames)
    ]

    # warmup / compile
    jax.block_until_ready(fwd(latents[0]))
    t0 = time.perf_counter()
    for z in latents:
        out = fwd(z)
    jax.block_until_ready(out)
    dt_fwd = (time.perf_counter() - t0) / args.frames

    jax.block_until_ready(fwdbwd(latents[0]))
    t0 = time.perf_counter()
    for z in latents:
        out2 = fwdbwd(z)
    jax.block_until_ready(out2)
    dt_fb = (time.perf_counter() - t0) / args.frames

    mrays = n_rays / dt_fwd / 1e6
    result = {
        "metric": f"Mrays/s fwd sphere-traced (DeepSDF-8L, {img}^2, {args.steps} steps)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 4),
        "fwd_ms_per_frame": round(dt_fwd * 1e3, 3),
        "fwdbwd_ms_per_frame": round(dt_fb * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
