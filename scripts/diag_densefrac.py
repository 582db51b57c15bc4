"""Hardware sweep of queue_march's dense_frac at 512^2.

Isolates the round-3 gen-0 scheduling knob (pack sparse chunks without
marching vs march-in-place) from the out-DMA double-buffering it landed
with: dense_frac=0.0 reproduces the pre-knob schedule exactly.

  python scripts/diag_densefrac.py [--img 512] [--caps 6 16]
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

from dist_renderer_tpu.config import DecoderConfig, MarchConfig
from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
from dist_renderer_tpu.models.pretrain import get_or_fit_cached
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.pallas.batched_march import render_batched_c2f


def timeit(fn, *a, n=10):
    # end warmup AND the timed region with a real device->host fetch:
    # block_until_ready alone is a silent no-op on this tunneled backend
    # until the process's first fetch (see docs/PERFORMANCE.md).
    out = fn(*a)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--caps", type=int, nargs="*", default=[6, 16])
    ap.add_argument("--fracs", type=float, nargs="*",
                    default=[0.0, 0.25, 0.5, 0.75, 0.9, 2.0])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    img = args.img
    dcfg = DecoderConfig()
    shape = round_union(
        torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08
    )
    params, z0 = get_or_fit_cached(
        "/root/repo/.bench_decoder.npz", lambda p: shape(None, p), dcfg,
        steps=1500,
    )
    march = MarchConfig(
        max_steps=50, convergence_eps=2e-3, depth_eps=5e-4,
        coarse_to_fine=True, c2f_strides=(16, 4), c2f_coarse_steps=16,
    )
    cam = Camera.looking_at(
        (0.0, 0.0, -2.5), focal=img * 1.2, img_hw=(img, img)
    )
    o, v = pixel_rays(cam, img, img)
    lat = z0[None]
    ob, vb = o[None], v[None]
    print(f"device: {jax.devices()[0]}  caps={tuple(args.caps)}", flush=True)

    ref_h = None
    for frac in args.fracs:
        f_q = jax.jit(lambda l, o_, v_, frac=frac: render_batched_c2f(
            params, dcfg, l, o_, v_, (img, img), march,
            shared_origin=True, scheduler="queue",
            queue_caps=tuple(args.caps), queue_dense_frac=frac,
            interpret=args.cpu,
        ))
        d, h, m = f_q(lat, ob, vb)
        jax.block_until_ready(d)
        t = timeit(f_q, lat, ob, vb)
        h = np.asarray(h)
        if ref_h is None:
            ref_h = h
        print(f"dense_frac={frac:4.2f}: {t*1e3:8.2f} ms "
              f"({img*img/t/1e6:6.2f} Mrays/s)  hits={int(h.sum())} "
              f"agree={(h == ref_h).mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
