"""Work-binning primitives for the classified c2f pipeline.

The per-frame ray ordering (rim -> interior -> skip, and the finer
difficulty buckets) only needs a STABLE SORT OVER A FEW SMALL INTEGER
CLASSES — a full `jnp.argsort` is a bitonic O(N log^2 N) sort network on
TPU and measurably dominates the planning glue at 512^2 (two argsorts per
frame in round 1). A counting sort is K cumsums + one scatter.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def counting_sort_perm(key: jax.Array, num_classes: int) -> Tuple[jax.Array, jax.Array]:
    """Stable counting-sort permutations for small-integer keys.

    key: [..., N] int32 in [0, num_classes) (leading dims vmapped).
    Returns (order, inv), both [..., N] int32, with
      order == jnp.argsort(key, stable=True)   (gather indices: x[order])
      inv[i] == sorted position of element i   (unsort: sorted[inv] == x)
    at K cumsums + 1 scatter instead of two bitonic sorts.
    """

    def one(k):
        n = k.shape[0]
        dest = jnp.zeros((n,), jnp.int32)
        start = jnp.zeros((), jnp.int32)
        for c in range(num_classes):
            m = k == c
            ranks = jnp.cumsum(m.astype(jnp.int32)) - 1
            dest = jnp.where(m, start + ranks, dest)
            start = start + jnp.sum(m, dtype=jnp.int32)
        order = jnp.zeros((n,), jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True
        )
        return order, dest

    f = one
    for _ in range(key.ndim - 1):
        f = jax.vmap(f)
    return f(key)
