"""A/B the work-queue generation caps IN THE FULL single-frame render
graph (bench.py's fwd: depth + min_sdf) on the real TPU.

diag_queue.py sweeps caps on render_batched_c2f with its OWN default
(6,16) — the production render() path passes MarchConfig.queue_caps
(1,2,6,16). This measures candidates at the production boundary, with a
bit-identity guard on hits/depth (caps are pure scheduling — the march
carry is Markov, so every schedule must agree exactly).

  python scripts/diag_caps_ab.py [--img 512]
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
    from dist_renderer_tpu.ops.camera import Camera
    from dist_renderer_tpu.ops.renderer import make_march_factory, render

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
    sdf_fn = make_precise_sdf(params, dcfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    import numpy as np

    ref = None
    for caps in ((1, 2, 6, 16), (1, 2, 4, 12), (4, 12), (1, 4, 12)):
        cfg = RenderConfig(
            img_h=img, img_w=img,
            march=MarchConfig(
                max_steps=50, coarse_to_fine=True, use_compaction=not on_tpu,
                convergence_eps=2e-3, depth_eps=5e-4,
                c2f_strides=(16, 4), c2f_coarse_steps=16,
                queue_caps=caps,
            ),
            grad=GradConfig(mode="ift", compact_frac=4, recompute="pallas"),
            compute_dtype="bfloat16",
            use_pallas=on_tpu,
        )
        factory = make_march_factory(params, dcfg, cfg)

        @jax.jit
        def fwd(z, cfg=cfg, factory=factory):
            out = render(sdf_fn, z, cam, cfg, factory)
            return out.depth, out.min_sdf, out.mask

        d, ms, hit = fwd(z0)
        float(jnp.sum(d))  # hard sync (block_until_ready no-ops pre-fetch)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = fwd(z0)
            float(jnp.sum(out[0]))
            ts.append((time.perf_counter() - t0) / 8)
        t_fwd = min(ts)

        d_np, hit_np = np.asarray(d), np.asarray(hit)
        if ref is None:
            ref = (d_np, hit_np)
            tag = "exact-by-definition"
        else:
            agree = float(np.mean(hit_np == ref[1]))
            both = hit_np & ref[1]
            dmax = float(np.abs(d_np - ref[0])[both].max()) if both.any() else 0.0
            tag = f"hit-agree={agree:.5f} max|dd|={dmax:.2e}"
            if agree != 1.0 or dmax != 0.0:
                print(f"caps={caps}: fwd {t_fwd*1e3:7.2f} ms   {tag}",
                      flush=True)
                print("FAIL: bit-identity guard tripped — caps changed the "
                      "march result (schedule-dependence regression)",
                      flush=True)
                sys.exit(1)
        print(f"caps={caps}: fwd {t_fwd*1e3:7.2f} ms   {tag}", flush=True)


if __name__ == "__main__":
    main()
