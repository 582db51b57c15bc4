"""Chamfer-distance evaluation.

Reference analog: ``core/evaluation/`` in B1ueber2y/DIST-Renderer
(SURVEY.md §2 'Evaluation'): symmetric chamfer distance between the
optimized shape's surface samples and the ground-truth mesh, aggregated
per category.

TPU-first: the pairwise-min is a tiled jnp computation under jit (chunked
over the first point set so 30k x 30k never materializes), not a KD-tree —
O(N*M) on the MXU beats tree traversal on this hardware by a wide margin.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2,))
def _min_sq_dists(a: jax.Array, b: jax.Array, chunk: int = 1024) -> jax.Array:
    """min over b of ||a_i - b_j||^2, chunked over a. a [N,3], b [M,3]."""
    n = a.shape[0]
    pad = (-n) % chunk
    a_p = jnp.pad(a, ((0, pad), (0, 0)))
    a_c = a_p.reshape(-1, chunk, 3)
    b_sq = jnp.sum(b * b, axis=-1)

    def body(ac):
        d = (
            jnp.sum(ac * ac, axis=-1)[:, None]
            - 2.0 * ac @ b.T
            + b_sq[None, :]
        )
        return jnp.min(d, axis=-1)

    mins = jax.lax.map(body, a_c).reshape(-1)[:n]
    return jnp.maximum(mins, 0.0)


def chamfer_distance(
    points_a: jax.Array,
    points_b: jax.Array,
    squared: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Symmetric chamfer: (mean_a min_b d, mean_b min_a d, their sum).

    squared=True matches DeepSDF/DIST's convention of reporting mean
    squared distances; False gives mean euclidean distances."""
    d_ab = _min_sq_dists(points_a, points_b)
    d_ba = _min_sq_dists(points_b, points_a)
    if not squared:
        d_ab, d_ba = jnp.sqrt(d_ab), jnp.sqrt(d_ba)
    a2b = jnp.mean(d_ab)
    b2a = jnp.mean(d_ba)
    return a2b, b2a, a2b + b2a


def sample_surface_points(
    sdf_fn: Callable[[jax.Array], jax.Array],
    n: int = 30000,
    key: Optional[jax.Array] = None,
    iters: int = 8,
    keep_band: float = 1e-3,
) -> jax.Array:
    """Sample points on the zero set of an SDF by gradient-descent
    projection of random seeds — used when a mesh is not needed (chamfer
    on surface samples). Points that fail to reach |sdf| < keep_band are
    resampled from the survivors."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    p = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    g_fn = jax.grad(lambda q: jnp.sum(sdf_fn(q)))

    @jax.jit
    def project(p):
        for _ in range(iters):
            s = sdf_fn(p)
            g = g_fn(p)
            g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
            p = p - s[:, None] * g
        return p, jnp.abs(sdf_fn(p)) < keep_band

    p, ok = project(p)
    # replace failures with random good points
    idx_ok = jnp.nonzero(ok, size=n, fill_value=0)[0]
    choice = jax.random.randint(k2, (n,), 0, jnp.maximum(jnp.sum(ok), 1))
    repl = p[idx_ok[choice]]
    return jnp.where(ok[:, None], p, repl)


def chamfer_vs_analytic(
    pred_sdf_fn: Callable,
    gt_sdf_fn: Callable,
    n: int = 20000,
    key: Optional[jax.Array] = None,
) -> float:
    """Convenience: symmetric chamfer between two SDFs' surfaces."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    pa = sample_surface_points(pred_sdf_fn, n, ka)
    pb = sample_surface_points(gt_sdf_fn, n, kb)
    return float(chamfer_distance(pa, pb)[2])
