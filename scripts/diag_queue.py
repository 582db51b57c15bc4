"""Hardware validation + timing of the work-queue fine march at 512^2.

Compares render_batched_c2f scheduler="rounds" (multi-round sort
re-binning) vs scheduler="queue" (one-launch in-kernel work queue) on the
real TPU: correctness (hit agreement, depth parity on hits) and forward
wall time at F=1 and F=8, plus a generation-cap sweep.

  python scripts/diag_queue.py [--f 1] [--img 512]
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
    # warmup and timed region end with a real fetch: block_until_ready is
    # a no-op until the process's first device->host round-trip
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
    ap.add_argument("--frames", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interp = args.cpu

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
    print(f"device: {jax.devices()[0]}", flush=True)

    for F in args.frames:
        lat = jnp.stack([z0] * F) + 0.001 * jax.random.normal(
            jax.random.PRNGKey(9), (F, dcfg.latent_size)
        )
        ob = jnp.broadcast_to(o[None], (1,) + o.shape)
        vb = jnp.broadcast_to(v[None], (1,) + v.shape)

        def run(sched, caps=(6, 16)):
            return jax.jit(lambda l, o_, v_: render_batched_c2f(
                params, dcfg, l,
                jnp.broadcast_to(o_, (F,) + o_.shape[1:]),
                jnp.broadcast_to(v_, (F,) + v_.shape[1:]),
                (img, img), march, shared_origin=True,
                scheduler=sched, queue_caps=caps, interpret=interp,
            ))

        f_r = run("rounds")
        d_r, h_r, m_r = f_r(lat, ob, vb)
        jax.block_until_ready(d_r)
        t_r = timeit(f_r, lat, ob, vb)
        print(f"F={F} rounds: {t_r*1e3:8.2f} ms  "
              f"({F*img*img/t_r/1e6:6.2f} Mrays/s)  hits={int(np.asarray(h_r).sum())}",
              flush=True)

        for caps in ((6, 16), (4, 12), (8,), (6, 16, 32)):
            f_q = run("queue", caps)
            d_q, h_q, m_q = f_q(lat, ob, vb)
            jax.block_until_ready(d_q)
            t_q = timeit(f_q, lat, ob, vb)
            hq, hr = np.asarray(h_q), np.asarray(h_r)
            both = hq & hr
            derr = np.abs(np.asarray(d_q) - np.asarray(d_r))[both]
            p95 = float(np.percentile(derr, 95)) if both.any() else 0.0
            print(f"F={F} queue{caps}: {t_q*1e3:8.2f} ms  "
                  f"({F*img*img/t_q/1e6:6.2f} Mrays/s)  "
                  f"hit agree={(hq == hr).mean():.5f} p95 depth(on both-hit)={p95:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
