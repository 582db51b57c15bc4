"""A/B the fused value+directional-derivative eval (GradConfig.fused_dd)
in the CURRENT render graph.

fused_dd rides the IFT-denominator tangent on the precise value pass
(one extra bf16 matmul per layer) instead of a separate jvp. It measured
8.0 -> 1.7 ms in isolation but CONTEXT-NEGATIVE (fwd 34.8 -> 39.4 ms)
when it first landed — XLA scheduled the separate jvp better. The graph
has since changed (queue scheduler, lazy margins, fused scatters), so
re-measure whenever the single-frame path moves.

  python scripts/diag_fused_dd.py [--img 512]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.renderer import make_march_factory, render
    from dist_renderer_tpu.utils.losses import masked_l1

    img = args.img
    dcfg = DecoderConfig()
    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    params, z0 = get_or_fit_cached(
        "/root/repo/.bench_decoder.npz", lambda p: shape(None, p), dcfg,
        steps=1500,
    )
    on_tpu = (not args.cpu) and jax.devices()[0].platform != "cpu"
    cam = Camera.looking_at(
        (0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img)
    )
    target = jnp.full((img, img), 1.5)
    mask = jnp.ones((img, img), bool)
    sdf_fn = make_precise_sdf(params, dcfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    for fused in (False, True):
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, coarse_to_fine=True, use_compaction=not on_tpu,
                convergence_eps=2e-3, depth_eps=5e-4,
                c2f_strides=(16, 4), c2f_coarse_steps=16,
            ),
            grad=GradConfig(mode="ift", compact_frac=4, fused_dd=fused),
            compute_dtype="bfloat16",
            use_pallas=on_tpu,
        )
        factory = make_march_factory(params, dcfg, cfg)

        @jax.jit
        def fwdbwd(z, cfg=cfg, factory=factory):
            def loss(zz):
                out = render(sdf_fn, zz, cam, cfg, factory)
                return masked_l1(out.depth, target, mask)

            return jax.value_and_grad(loss)(z)

        l, g = fwdbwd(z0)
        float(jnp.sum(g))  # hard sync (block_until_ready no-ops pre-fetch)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                l, g = fwdbwd(z0)
            float(jnp.sum(g))
            ts.append((time.perf_counter() - t0) / 8)
        print(f"fused_dd={fused}: fwd+bwd {min(ts)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
