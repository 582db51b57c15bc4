"""Warm-start fit-step wall time on real TPU (VERDICT r2 item 2 bar:
>=2x wall-time drop per optimization step in depth_completion /
pose_refine at 256^2-512^2, fit quality unchanged).

Times one depth-completion Adam step (render + loss + grad + update)
cold (full c2f pyramid every step) vs warm (previous trace seeds the
next render, full refresh every 8), at 256^2 and 512^2.

  python scripts/diag_warm.py [--img 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dist_renderer_tpu.config import (
    DecoderConfig, GradConfig, MarchConfig, RenderConfig,
)
from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
from dist_renderer_tpu.models.decoder import make_precise_sdf
from dist_renderer_tpu.models.pretrain import get_or_fit_cached
from dist_renderer_tpu.ops.camera import Camera
from dist_renderer_tpu.ops.renderer import (
    make_march_factory, render, render_with_warm, warm_from_trace,
)
from dist_renderer_tpu.utils import losses as L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--refresh", type=int, default=8)
    ap.add_argument("--recompute", default="pallas", choices=["xla", "pallas"])
    args = ap.parse_args()

    dcfg = DecoderConfig()
    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    params, z_gt = get_or_fit_cached(
        "/root/repo/.bench_decoder.npz", lambda p: shape(None, p), dcfg,
        steps=1500,
    )
    sdf_fn = make_precise_sdf(params, dcfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    for img in args.imgs:
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
                coarse_to_fine=True, c2f_strides=(16, 4),
                c2f_coarse_steps=16,
            ),
            grad=GradConfig(mode="ift", compact_frac=4,
                            recompute=args.recompute),
            compute_dtype="bfloat16",
            use_pallas=True,
        )
        factory = make_march_factory(params, dcfg, cfg)
        cam = Camera.looking_at(
            (0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img)
        )
        gt = render(sdf_fn, z_gt, cam, cfg, factory)
        obs_depth, obs_mask = gt.depth, gt.mask
        tx = optax.adam(1e-2)

        def obj(z, out):
            ld = L.depth_loss(out.depth, obs_depth, obs_mask, out.mask)
            ls = L.silhouette_loss(out.min_sdf, obs_mask)
            return 10.0 * ld + ls + 1e-4 * L.latent_reg(z)

        @jax.jit
        def step_cold(z, opt):
            def loss(zz):
                return obj(zz, render(sdf_fn, zz, cam, cfg, factory))

            l, g = jax.value_and_grad(loss)(z)
            up, opt = tx.update(g, opt, z)
            return optax.apply_updates(z, up), opt, l

        @jax.jit
        def step_warm(z, opt, carry):
            def loss(zz):
                out, c2 = render_with_warm(
                    sdf_fn, zz, cam, cfg, factory, carry, args.refresh
                )
                return obj(zz, out), c2

            (l, carry), g = jax.value_and_grad(loss, has_aux=True)(z)
            up, opt = tx.update(g, opt, z)
            return optax.apply_updates(z, up), opt, l, carry

        z0 = jnp.zeros_like(z_gt)

        # cold timing
        z, opt = z0, tx.init(z0)
        z, opt, l = step_cold(z, opt)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            z, opt, l = step_cold(z, opt)
        jax.block_until_ready(l)
        t_cold = (time.perf_counter() - t0) / args.steps
        loss_cold = float(l)

        # warm timing (carry starts from one cold render)
        z, opt = z0, tx.init(z0)
        out0 = render(sdf_fn, z, cam, cfg, factory)
        carry = (jnp.int32(1), warm_from_trace(out0.trace))
        z, opt, l, carry = step_warm(z, opt, carry)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            z, opt, l, carry = step_warm(z, opt, carry)
        jax.block_until_ready(l)
        t_warm = (time.perf_counter() - t0) / args.steps
        loss_warm = float(l)

        print(
            f"img {img}^2: cold {t_cold*1e3:7.2f} ms/step "
            f"(loss {loss_cold:.5f}) | warm {t_warm*1e3:7.2f} ms/step "
            f"(loss {loss_warm:.5f}) | speedup {t_cold/t_warm:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
