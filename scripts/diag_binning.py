"""Straggler-binning study: record per-ray TRUE fine-march step counts +
plan features from one TPU run, then simulate candidate sort keys OFFLINE
(block residency sum = what the kernel actually pays) to pick the binning
strategy before spending TPU compiles on it.

  python scripts/diag_binning.py --img 512 --frames 8
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 512


def residency_ms(steps, key, us_per_block_step=11.5):
    """Sort rays per frame by key, pack into 512-lane blocks, return
    (sum of per-block max steps, implied kernel ms)."""
    f, n = steps.shape
    tot = 0
    for i in range(f):
        order = np.argsort(key[i], kind="stable")
        s = steps[i][order]
        pad = (-len(s)) % BLOCK
        s = np.pad(s, (0, pad))
        tot += int(s.reshape(-1, BLOCK).max(axis=1).sum())
    return tot, tot * us_per_block_step / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--strides", type=int, nargs="*", default=[4])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.camera import Camera, pixel_rays
    from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f

    img, F = args.img, args.frames
    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_decoder.npz")
    params, latent = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg, steps=1500)
    march = MarchConfig(max_steps=args.steps, coarse_to_fine=True,
                        convergence_eps=2e-3, depth_eps=5e-4)
    cam = Camera.looking_at((0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img))
    o, v = pixel_rays(cam, img, img)
    n = o.shape[0]
    lat_b = jnp.stack([latent] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(o[None], (F, n, 3))
    vb = jnp.broadcast_to(v[None], (F, n, 3))

    fbd = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march,
        strides=tuple(args.strides), with_diag=True, return_steps=True,
        shared_origin=True))
    _, _, _, steps_px, diag = fbd(lat_b, ob, vb)

    # per-ray FINE steps come back in pixel order via return_steps
    steps = np.asarray(steps_px)
    key = np.asarray(diag["plan_key"])          # 0 rim, 1 interior, 2 skip
    width = np.asarray(diag["plan_width"])      # coarse window depth range
    np.savez("/tmp/binning_dump.npz", steps=steps, key=key, width=width)
    for name in sorted(diag):
        if name.endswith("_ray_steps"):
            v_ = np.asarray(diag[name])
            print(f"coarse phase {name}: total={v_.sum()} mean={v_.mean():.2f}")
        if name.endswith("_block_residency"):
            v_ = np.asarray(diag[name])
            print(f"  {name}: blocks={v_.size} residency={v_.sum()}")

    print(f"fine evals total={steps.sum()}  per class: "
          f"rim={steps[key == 0].sum()} ({(key == 0).mean():.3f} of rays, "
          f"mean {steps[key == 0].mean():.1f}) "
          f"interior={steps[key == 1].sum()} ({(key == 1).mean():.3f}, "
          f"mean {steps[key == 1].mean():.1f}) "
          f"skip={steps[key == 2].sum()} ({(key == 2).mean():.3f})")
    w_int = width[key == 1]
    s_int = steps[key == 1]
    for lo, hi in [(0, 0.01), (0.01, 0.03), (0.03, 0.1), (0.1, 1e9)]:
        m = (w_int >= lo) & (w_int < hi)
        if m.sum():
            print(f"  interior width [{lo},{hi}): frac={m.mean():.3f} "
                  f"steps mean={s_int[m].mean():.1f} p90={np.percentile(s_int[m], 90):.0f} "
                  f"max={s_int[m].max()}")

    print("\n=== simulated block-residency (fine march only) ===")
    strategies = {
        "current (class)": key,
        "oracle (true steps)": -steps,
        "class+width(4q)": key * 100 + np.digitize(
            np.nan_to_num(width, posinf=9.0), [0.01, 0.03, 0.1]),
        "class+width(8q)": key * 100 + np.digitize(
            np.nan_to_num(width, posinf=9.0),
            [0.005, 0.01, 0.02, 0.03, 0.05, 0.1, 0.3]),
        "width only": np.digitize(np.nan_to_num(width, posinf=9.0),
                                  [0.005, 0.01, 0.02, 0.03, 0.05, 0.1, 0.3])
                      + 100 * (key == 2),
    }
    for name, k in strategies.items():
        tot, ms = residency_ms(steps, k)
        print(f"  {name:24s}: residency={tot:7d}  ~{ms:6.1f} ms kernel")

    # two-round simulation: cap phase A at c, requeue unresolved
    for cap in (8, 12, 16):
        # phase A pays min(steps, cap) under the current class sort
        sA = np.minimum(steps, cap)
        totA, msA = residency_ms(sA, key)
        # unresolved rays (steps > cap) continue for steps-cap more, densely
        # packed (sorted by remaining work, oracle-ish since they're few)
        rem = np.maximum(steps - cap, 0)
        totB, msB = residency_ms(rem, -rem)
        print(f"  two-round cap={cap:2d}        : residency={totA + totB:7d}  "
              f"~{msA + msB:6.1f} ms kernel (+1 sort/gather)")


if __name__ == "__main__":
    main()
