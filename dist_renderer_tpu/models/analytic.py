"""Analytic SDF oracles for testing and benchmarking the tracer.

The reference has no test suite (SURVEY.md §4); these closed-form SDFs are
the rebuild's unit-test backbone: sphere tracing against them has exact
depths and normals, so tracer correctness is checked to ~1e-6 without any
pretrained checkpoint.

Each oracle has the same signature as a bound decoder:
    sdf_fn(latent, points[..., 3]) -> sdf[...]
(latent ignored or used as shape parameters), so oracles drop into the
renderer anywhere a neural decoder does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sphere_sdf(radius: float = 0.5, center=(0.0, 0.0, 0.0)):
    c = jnp.asarray(center)

    def f(latent, points):
        del latent
        return jnp.linalg.norm(points - c, axis=-1) - radius

    return f


def box_sdf(half_extents=(0.4, 0.3, 0.2)):
    b = jnp.asarray(half_extents)

    def f(latent, points):
        del latent
        q = jnp.abs(points) - b
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    return f


def torus_sdf(major: float = 0.4, minor: float = 0.15):
    def f(latent, points):
        del latent
        qx = jnp.sqrt(points[..., 0] ** 2 + points[..., 2] ** 2) - major
        return jnp.sqrt(qx**2 + points[..., 1] ** 2) - minor

    return f


def round_union(f1, f2, k: float = 0.1):
    """Smooth union — a composite shape to stress overshoot correction."""

    def f(latent, points):
        d1, d2 = f1(latent, points), f2(latent, points)
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
        return d2 + (d1 - d2) * h - k * h * (1.0 - h)

    return f


def latent_sphere_sdf():
    """Sphere whose radius is latent[0] — exercises d(depth)/d(latent)
    against the closed form: for a centered sphere, depth = |c| - r along a
    center ray, so d depth / d r = -1. Used by the gradcheck tests."""

    def f(latent, points):
        return jnp.linalg.norm(points, axis=-1) - latent[..., 0]

    return f


def analytic_sphere_depth(origins, dirs, radius: float):
    """Closed-form ray/sphere-at-origin hit distance; -1 where missed."""
    b = jnp.sum(origins * dirs, axis=-1)
    c = jnp.sum(origins * origins, axis=-1) - radius**2
    disc = b * b - c
    hit = disc >= 0.0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(hit & (t > 0), t, -1.0)
