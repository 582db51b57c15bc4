"""Precise-value-path study: the bf16x3 split eval costs 55 ms/frame at
512^2 (scripts/diag_perf.py) — the single largest latency item. Measure
cheaper variants' VALUE error against a CPU fp32 reference to find the
cheapest one that still holds the <=1e-3 depth-parity budget.

  python scripts/diag_precision.py
"""

import os
import sys
import time

import numpy as np

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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.config import DecoderConfig
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.decoder import decoder_apply
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached

    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_decoder.npz")
    params, latent = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg, steps=1500)

    # near-surface points (where the depth anchor is evaluated): sample the
    # sphere interior, keep |f_cpu| small-ish
    cpu = jax.devices("cpu")[0]
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (200000, 3), minval=-0.9, maxval=0.9)
    with jax.default_device(cpu):
        params_c = jax.device_put(params, cpu)
        lat_c = jax.device_put(latent, cpu)
        f_ref = np.asarray(decoder_apply(params_c, lat_c, jax.device_put(pts, cpu), dcfg))
    near = np.abs(f_ref) < 0.05
    print(f"{near.sum()} near-surface points of {len(f_ref)}")

    n_t = 262144  # timing size = one 512^2 frame
    pts_t = jax.random.uniform(jax.random.PRNGKey(1), (n_t, 3), minval=-0.9, maxval=0.9)

    variants = {
        "split-all (current)": dict(precision="split"),
        "bf16-plain": dict(compute_dtype=jnp.bfloat16),
        "split-x-layers": dict(precision="split_x"),
        "fp32-default": dict(compute_dtype=jnp.float32),
    }
    for name, kw in variants.items():
        try:
            fn = jax.jit(lambda z, p, kw=kw: decoder_apply(params, z, p, dcfg, **kw))
            t, _ = timeit(fn, latent, pts_t)
            f_v = np.asarray(fn(latent, pts))
            err = np.abs(f_v - f_ref)
            print(f"{name:22s}: {t*1e3:6.1f} ms/262k   "
                  f"err all p50={np.percentile(err, 50):.2e} "
                  f"p95={np.percentile(err, 95):.2e} max={err.max():.2e}   "
                  f"near-surface p95={np.percentile(err[near], 95):.2e} "
                  f"max={err[near].max():.2e}")
        except Exception as e:
            print(f"{name:22s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
