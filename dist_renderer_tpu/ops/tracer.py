"""Differentiable sphere tracer core — the rebuild of the reference's
``core/sdfrenderer/renderer.py`` march loop (SURVEY.md §3.1).

TPU-first design notes:
  - The reference shrinks a dynamic index list of live rays every step
    ("dynamic synchronized inference") — dynamic shapes are hostile to XLA,
    so here ALL rays live in a dense fixed-shape batch with an `active`
    mask, marched under `lax.while_loop` (dynamic trip count, static
    shapes). The live-set savings are recovered by (a) while_loop early
    exit once every ray converges, and (b) fixed-shape compaction buckets
    (ops/compaction.py, perf layer).
  - The whole march is non-differentiable by construction (it is wrapped in
    stop_gradient by the renderer); gradients are re-derived from ONE extra
    decoder eval at the recorded surface points (SURVEY.md §3.2) — memory
    is flat in march steps.
  - Aggressive marching: d += alpha * sdf with alpha > 1 gambles on
    overshoot to cut steps (paper §3.3); rays that cross the surface
    (sdf < 0) drop to the conservative gain 1 for all later steps, which
    keeps convergence safe (sdf < 0 pulls the ray back).

The tracer is generic over any `sdf_fn(points [N,3]) -> sdf [N]` closure —
neural decoders and analytic oracles drop in interchangeably.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig
from dist_renderer_tpu.ops.camera import ray_sphere_entry


class TraceResult(NamedTuple):
    """Per-ray march outcome (all [N] unless noted)."""

    depth: jax.Array        # converged hit distance (valid where hit)
    hit: jax.Array          # bool: ray converged onto the surface
    min_sdf: jax.Array      # running min of sdf along the march (silhouette margin)
    depth_at_min: jax.Array # distance at which min_sdf was observed
    last_sdf: jax.Array     # sdf at the final evaluated point
    steps_used: jax.Array   # scalar: march iterations executed
    live_counts: jax.Array  # [max_steps] int32: live rays per step (telemetry)


class _State(NamedTuple):
    d: jax.Array
    active: jax.Array
    hit: jax.Array
    gain: jax.Array
    min_sdf: jax.Array
    d_at_min: jax.Array
    last_sdf: jax.Array
    step: jax.Array
    live_counts: jax.Array


def sphere_trace(
    sdf_fn: Callable[[jax.Array], jax.Array],
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
) -> TraceResult:
    """March rays against an SDF. Non-differentiable (wrap the outputs in
    stop_gradient; the renderer recomputes differentiable quantities)."""
    n = origins.shape[0]
    f32 = jnp.float32

    t_near, t_far, enters = ray_sphere_entry(
        origins, dirs, march.sphere_radius, 0.0
    )
    far_bound = t_far + march.far_margin

    # Rays that miss the bounding sphere: background immediately; their
    # silhouette margin is anchored at the closest approach to the origin
    # so the differentiable min-SDF recompute samples a sensible point.
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)

    state = _State(
        d=jnp.where(enters, t_near, t_closest).astype(f32),
        active=enters,
        hit=jnp.zeros((n,), bool),
        gain=jnp.full((n,), march.alpha, f32),
        min_sdf=jnp.full((n,), jnp.inf, f32),
        d_at_min=jnp.where(enters, t_near, t_closest).astype(f32),
        last_sdf=jnp.full((n,), jnp.inf, f32),
        step=jnp.zeros((), jnp.int32),
        live_counts=jnp.zeros((march.max_steps,), jnp.int32),
    )

    def cond(s: _State):
        return (s.step < march.max_steps) & jnp.any(s.active)

    def body(s: _State) -> _State:
        p = origins + s.d[:, None] * dirs
        sdf = sdf_fn(p).astype(f32)

        # min-|margin| buffer (reference keeps per-ray min SDF for the soft
        # silhouette — SURVEY.md §3.1); track the minimum signed value seen
        # while the ray is live, and where it happened.
        better = s.active & (sdf < s.min_sdf)
        min_sdf = jnp.where(better, sdf, s.min_sdf)
        d_at_min = jnp.where(better, s.d, s.d_at_min)

        converged = s.active & (jnp.abs(sdf) < march.convergence_eps)
        # Overshoot corrector: once inside (sdf < 0), drop to gain 1 forever.
        gain = jnp.where(s.active & (sdf < 0.0), 1.0, s.gain)
        d_new = s.d + gain * sdf
        missed = s.active & ~converged & (d_new > far_bound)

        still_active = s.active & ~converged & ~missed
        live_counts = jax.lax.dynamic_update_index_in_dim(
            s.live_counts, jnp.sum(s.active).astype(jnp.int32), s.step, 0
        )

        return _State(
            d=jnp.where(still_active, d_new, s.d),
            active=still_active,
            hit=s.hit | converged,
            gain=gain,
            min_sdf=min_sdf,
            d_at_min=d_at_min,
            last_sdf=jnp.where(s.active, sdf, s.last_sdf),
            step=s.step + 1,
            live_counts=live_counts,
        )

    out = jax.lax.while_loop(cond, body, state)

    # Rays that never entered the bounding sphere: geometric lower bound on
    # the margin (distance of closest approach to the sphere surface). The
    # differentiable silhouette pass replaces this with a real decoder eval.
    p_closest = origins + t_closest[:, None] * dirs
    geo_margin = jnp.linalg.norm(p_closest, axis=-1) - march.sphere_radius
    min_sdf = jnp.where(enters, out.min_sdf, geo_margin)
    min_sdf = jnp.where(jnp.isinf(min_sdf), geo_margin, min_sdf)

    return TraceResult(
        depth=out.d,
        hit=out.hit,
        min_sdf=min_sdf,
        depth_at_min=out.d_at_min,
        last_sdf=out.last_sdf,
        steps_used=out.step,
        live_counts=out.live_counts,
    )
