"""Sweep batched-path c2f configs on the real TPU (one process, many jits).

  python scripts/sweep_batched.py --img 512 --frames 8
"""

import argparse
import itertools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync_fetch(out):
    """Pull one scalar to the host — the only reliable sync here."""
    import jax.numpy as _jnp

    x = out
    while isinstance(x, (tuple, list, dict)):
        x = list(x.values())[0] if isinstance(x, dict) else x[0]
    float(_jnp.sum(x))


def timeit(fn, *a, n=3):
    # hard host-fetch syncs: block_until_ready is a silent no-op until
    # the process's first device->host fetch (docs/PERFORMANCE.md)
    out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    _sync_fetch(out)
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rim-only", action="store_true",
                    help="only the default config + the alpha (rim-"
                         "aggressiveness) candidates — each config is a "
                         "fresh remote compile (10s-7min), so the full "
                         "grid is too slow at --frames 64")
    args = ap.parse_args()
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
    origins, dirs = pixel_rays(cam, img, img)
    n = origins.shape[0]
    lat_b = jnp.stack([latent] * F) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(9), (F, dcfg.latent_size))
    ob = jnp.broadcast_to(origins[None], (F, n, 3))
    vb = jnp.broadcast_to(dirs[None], (F, n, 3))

    # reference depth for correctness guard (default config)
    ref_fn = jax.jit(lambda l, o, v: render_batched_c2f(
        params, dcfg, l, o, v, (img, img), march, shared_origin=True))
    _, (d_ref, hit_ref, _) = timeit(ref_fn, lat_b, ob, vb, n=1)

    configs = []
    if args.rim_only:
        configs.append(dict(strides=(16, 4), coarse_steps=16,
                            round_caps=(4, 12), live_frac=3))
    else:
        for caps, lf in itertools.product(
            [(4, 12), (4, 8), (3, 9), (4, 10), (2, 6, 14), (5, 14)],
            [2, 3],
        ):
            configs.append(dict(strides=(16, 4), coarse_steps=16,
                                round_caps=caps, live_frac=lf))
    # rim-aggressiveness sweep: creep evals on grazing rays scale ~1/alpha
    # (rim = 59% of fine evals); alpha > 1.5 widens the skippable-feature
    # band from 0.5f to (alpha-1)f, so the hit-agree guard below is the
    # acceptance gate (disagreement must stay rim-confined)
    for a in (1.75, 2.0):
        configs.append(dict(strides=(16, 4), coarse_steps=16,
                            round_caps=(4, 12), live_frac=3, alpha=a))

    import dataclasses as _dc

    best = None
    for c in configs:
        label = dict(c)
        c = dict(c)
        m_c = march
        if "alpha" in c:
            m_c = _dc.replace(march, alpha=c.pop("alpha"))
        fb = jax.jit(lambda l, o, v, c=c, m_c=m_c: render_batched_c2f(
            params, dcfg, l, o, v, (img, img), m_c,
            shared_origin=True, **c))
        try:
            t, (d, hit, _) = timeit(fb, lat_b, ob, vb)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        mrays = F * n / t / 1e6
        import numpy as np
        both = np.asarray(hit_ref & hit)
        dd = np.abs(np.asarray(d_ref) - np.asarray(d))[both]
        agree = float(np.mean(np.asarray(hit_ref) == np.asarray(hit)))
        p95 = float(np.percentile(dd, 95)) if dd.size else 0.0
        print(f"{label}: {t*1e3:.1f} ms = {t*1e3/F:.2f} ms/frame -> "
              f"{mrays:.2f} Mrays/s  hit-agree={agree:.4f} p95|dd|={p95:.2e}",
              flush=True)
        if best is None or mrays > best[1]:
            best = (label, mrays)
    print("BEST:", best, flush=True)


if __name__ == "__main__":
    main()
