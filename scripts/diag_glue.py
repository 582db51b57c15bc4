"""Micro-benchmarks of the planning GLUE around the fused kernels on the
real TPU: sorts, gathers, scatters, and dead-grid kernel launches. These
decide how the straggler re-binning must be engineered.

  python scripts/diag_glue.py
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


def timeit(fn, *a, n=5):
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
    return (time.perf_counter() - t0) / n


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dist_renderer_tpu.ops.binning import counting_sort_perm

    F, N = 8, 262144
    key = jax.random.randint(jax.random.PRNGKey(0), (F, N), 0, 3)
    x3 = jax.random.normal(jax.random.PRNGKey(1), (F, N, 3))
    x1 = jax.random.normal(jax.random.PRNGKey(2), (F, N))

    t = timeit(jax.jit(lambda k: jnp.argsort(k, axis=1, stable=True)), key)
    print(f"argsort stable [8,262k] int32:        {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda k: counting_sort_perm(k, 3)), key)
    print(f"counting_sort_perm (3 classes):       {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda k: jnp.cumsum((k == 1).astype(jnp.int32), axis=1)), key)
    print(f"  one cumsum [8,262k]:                {t*1e3:7.2f} ms")
    dest = jax.random.permutation(jax.random.PRNGKey(3), N)[None].repeat(F, 0)
    t = timeit(jax.jit(lambda d: jnp.zeros((F, N), jnp.int32).at[
        jnp.arange(F)[:, None], d].set(jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (F, N)))), dest)
    print(f"  scatter perm [8,262k]:              {t*1e3:7.2f} ms")
    order = jnp.argsort(key, axis=1)
    t = timeit(jax.jit(lambda o: jnp.take_along_axis(x3, o[..., None], axis=1)), order)
    print(f"take_along_axis [8,262k,3]:           {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda o: jnp.take_along_axis(x1, o, axis=1)), order)
    print(f"take_along_axis [8,262k]:             {t*1e3:7.2f} ms")

    # dead-grid launch: batched kernel with ~0 active rays
    from dist_renderer_tpu.config import DecoderConfig, MarchConfig
    from dist_renderer_tpu.models.analytic import round_union, sphere_sdf, torus_sdf
    from dist_renderer_tpu.models.pretrain import get_or_fit_cached
    from dist_renderer_tpu.ops.pallas.batched_march import (
        batched_trace_padded, fold_bias_bank, pack_shared,
    )

    dcfg = DecoderConfig()
    shape = round_union(torus_sdf(0.55, 0.18), sphere_sdf(0.35, (0.0, 0.25, 0.0)), 0.08)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_decoder.npz")
    params, latent = get_or_fit_cached(cache, lambda p: shape(None, p), dcfg, steps=1500)
    shared = pack_shared(params, dcfg)
    lat_b = jnp.stack([latent] * F)
    bank = fold_bias_bank(params, lat_b, dcfg, shared)
    march = MarchConfig(max_steps=50, convergence_eps=2e-3, depth_eps=5e-4)
    o = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (F, N, 3))
    v = jnp.concatenate(
        [jnp.zeros((F, N, 2)), jnp.ones((F, N, 1))], axis=-1
    )
    for frac, name in [(0.0, "all-dead"), (0.06, "6% live")]:
        active = (jnp.arange(N)[None, :] < int(N * frac)).repeat(F, 0)
        fn = jax.jit(lambda a: batched_trace_padded(
            shared, bank, o, v, march, None, a).depth)
        t = timeit(fn, active, n=3)
        print(f"batched launch 4096 blocks ({name}): {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()


def sort_payload_bench():
    """Appendix: multi-operand lax.sort (key + payloads) vs argsort+gather."""
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    F, N = 8, 262144
    key = jax.random.randint(jax.random.PRNGKey(0), (F, N), 0, 3)
    pays = [jax.random.normal(jax.random.PRNGKey(i), (F, N)) for i in range(10)]

    def sort10(k, *ps):
        out = jax.lax.sort((k,) + ps, dimension=1, num_keys=1, is_stable=True)
        return out[1:]

    t = timeit(jax.jit(sort10), key, *pays)
    print(f"lax.sort key + 10 f32 payloads [8,262k]: {t*1e3:7.2f} ms")

    idx = jax.random.permutation(jax.random.PRNGKey(9), N)[None].repeat(F, 0)

    def unsort6(i, *ps):
        out = jax.lax.sort((i,) + ps, dimension=1, num_keys=1, is_stable=False)
        return out[1:]

    t = timeit(jax.jit(unsort6), idx, *pays[:6])
    print(f"lax.sort idx + 6 f32 payloads (unsort):  {t*1e3:7.2f} ms")

    # sanity: is the earlier 0.03ms argsort real? block on materialized sum
    t = timeit(jax.jit(lambda k: jnp.argsort(k, axis=1, stable=True).sum()), key)
    print(f"argsort + sum (force materialize):       {t*1e3:7.2f} ms")
    x1 = pays[0]
    order = jnp.argsort(key, axis=1)
    t = timeit(jax.jit(lambda o: jnp.take_along_axis(x1, o, axis=1).sum()), order)
    print(f"gather + sum (force materialize):        {t*1e3:7.2f} ms")


if __name__ == "__main__" and os.environ.get("GLUE_APPENDIX"):
    sort_payload_bench()
