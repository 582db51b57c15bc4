"""Measure the reordering-glue primitives at batched-render shapes.

  python scripts/diag_sortcost.py
"""

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
    F, N = 8, 512 * 512
    key = jax.random.PRNGKey(0)
    k = jax.random.randint(key, (F, N), 0, 3)
    pays = [jax.random.normal(jax.random.PRNGKey(i), (F, N)) for i in range(10)]
    idx = jnp.argsort(k, axis=1)

    for npay in (2, 4, 7, 10):
        f = jax.jit(lambda k, *ps: jax.lax.sort(
            (k,) + ps, dimension=1, num_keys=1, is_stable=True))
        t = timeit(f, k, *pays[:npay])
        print(f"lax.sort [F={F},N={N}] key+{npay} payloads: {t*1e3:.2f} ms")

    for npay in (2, 4, 7):
        f = jax.jit(lambda k, *ps: jax.lax.sort(
            (k[:, :N // 2],) + tuple(p[:, :N // 2] for p in ps),
            dimension=1, num_keys=1, is_stable=True))
        t = timeit(f, k, *pays[:npay])
        print(f"lax.sort HALF width key+{npay} payloads: {t*1e3:.2f} ms")

    f = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=1))
    t = timeit(f, pays[0], idx)
    print(f"take_along_axis one [F,N] f32: {t*1e3:.2f} ms")

    rows = jnp.stack(pays, axis=-1).reshape(F * N, 10)   # [2.1M, 10]
    ridx = jax.random.permutation(key, F * N)
    f = jax.jit(lambda r, i: jnp.take(r, i, axis=0))
    t = timeit(f, rows, ridx)
    print(f"row take [F*N, 10] f32 axis0: {t*1e3:.2f} ms")

    f = jax.jit(lambda r, i, v: r.at[i].set(v))
    t = timeit(f, rows, ridx, rows)
    print(f"row scatter-set [F*N, 10] axis0: {t*1e3:.2f} ms")

    # argsort then gather rows
    f = jax.jit(lambda kk: jnp.argsort(kk, axis=1, stable=True))
    t = timeit(f, k)
    print(f"argsort [F,N]: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
