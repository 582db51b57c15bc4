"""A/B/C the differentiable-recompute implementations in the CURRENT
render graph on the real TPU:

  xla     — precise value + separate jvp denominator (+ normals vjp)
  fused   — GradConfig.fused_dd (tangent rides the XLA value pass)
  pallas  — GradConfig.recompute="pallas": ONE fused kernel for
            (value, denominator, spatial gradient), custom-VJP backward
            kernel (ops/pallas/recompute.py)

Times fwd (depth+min_sdf outputs, like bench.py) and fwd+bwd (depth L1
loss -> latent grad) at 512^2.

  python scripts/diag_recompute.py [--img 512]
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
    ap.add_argument("--modes", default="xla,pallas")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dist_renderer_tpu.config import (
        DecoderConfig, GradConfig, MarchConfig, RenderConfig,
    )
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import make_precise_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera
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

    grads = {
        "xla": GradConfig(mode="ift", compact_frac=4),
        "fused": GradConfig(mode="ift", compact_frac=4, fused_dd=True),
        "pallas": GradConfig(mode="ift", compact_frac=4, recompute="pallas"),
    }
    ref = {}
    for name in args.modes.split(","):
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, coarse_to_fine=True, use_compaction=not on_tpu,
                convergence_eps=2e-3, depth_eps=5e-4,
                c2f_strides=(16, 4), c2f_coarse_steps=16,
            ),
            grad=grads[name],
            compute_dtype="bfloat16",
            use_pallas=on_tpu,
        )
        factory = make_march_factory(params, dcfg, cfg)

        @jax.jit
        def fwd(z, cfg=cfg, factory=factory):
            out = render(sdf_fn, z, cam, cfg, factory)
            return out.depth, out.min_sdf

        @jax.jit
        def fwdbwd(z, cfg=cfg, factory=factory):
            def loss(zz):
                out = render(sdf_fn, zz, cam, cfg, factory)
                return masked_l1(out.depth, target, mask)

            return jax.value_and_grad(loss)(z)

        d, ms = fwd(z0)
        float(jnp.sum(d))  # hard sync (block_until_ready no-ops pre-fetch)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = fwd(z0)
            float(jnp.sum(out[0]))
            ts.append((time.perf_counter() - t0) / 8)
        t_fwd = min(ts)

        l, g = fwdbwd(z0)
        float(jnp.sum(g))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                l, g = fwdbwd(z0)
            float(jnp.sum(g))
            ts.append((time.perf_counter() - t0) / 8)
        t_fb = min(ts)
        print(f"{name:7s}: fwd {t_fwd*1e3:7.2f} ms   fwd+bwd {t_fb*1e3:7.2f} ms",
              flush=True)

        import numpy as np

        if "depth" not in ref:
            ref["depth"], ref["g"] = np.asarray(d), np.asarray(g)
        else:
            dd = np.abs(np.asarray(d) - ref["depth"])
            cz = float(np.dot(np.asarray(g), ref["g"]) /
                       (np.linalg.norm(g) * np.linalg.norm(ref["g"]) + 1e-12))
            print(f"         depth vs first: p95 {np.quantile(dd, 0.95):.2e} "
                  f"max {dd.max():.2e}; grad cos {cz:.4f}", flush=True)


if __name__ == "__main__":
    main()
