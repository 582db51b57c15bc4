"""Differentiable sphere tracer core — the rebuild of the reference's
``core/sdfrenderer/renderer.py`` march loop (SURVEY.md §3.1).

TPU-first design notes:
  - The reference shrinks a dynamic index list of live rays every step
    ("dynamic synchronized inference") — dynamic shapes are hostile to XLA,
    so here ALL rays live in a dense fixed-shape batch with an `active`
    mask, marched under `lax.while_loop` (dynamic trip count, static
    shapes). The live-set savings are recovered by (a) while_loop early
    exit once every ray converges, and (b) fixed-shape compaction buckets
    (`sphere_trace_compact`).
  - The whole march is non-differentiable by construction (the renderer
    wraps it in stop_gradient); gradients are re-derived from ONE extra
    decoder eval at the recorded surface points (SURVEY.md §3.2) — memory
    is flat in march steps.
  - Aggressive marching: d += alpha * sdf with alpha > 1 gambles on
    overshoot to cut steps (paper §3.3). The overshoot CORRECTOR here is
    stronger than the reference's damped step: the first sign change
    brackets the surface, and the ray switches to guarded secant
    (regula falsi with a bisection clamp). This converges geometrically
    even for LEARNED SDFs whose values near the surface are noisy and
    whose directional derivative is far from 1 — the regime where a
    plain d += f fixed-point iteration oscillates forever (observed:
    ~20% of rays against a trained DeepSDF never reach |f| < 5e-5).

The tracer is generic over any `sdf_fn(points [N,3]) -> sdf [N]` closure —
neural decoders and analytic oracles drop in interchangeably.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig
from dist_renderer_tpu.ops.camera import ray_sphere_entry

_INF = jnp.inf


class TraceResult(NamedTuple):
    """Per-ray march outcome (all [N] unless noted)."""

    depth: jax.Array        # converged hit distance (valid where hit)
    hit: jax.Array          # bool: ray converged onto the surface
    min_sdf: jax.Array      # running min of sdf along the march (silhouette margin)
    depth_at_min: jax.Array # distance at which min_sdf was observed
    last_sdf: jax.Array     # sdf at the final evaluated point
    steps_used: jax.Array   # scalar: march iterations executed
    live_counts: jax.Array  # live-ray telemetry (per step / per outer round)
    unresolved: jax.Array   # bool: still live when the step budget ended
                            # (neither hit nor miss — used by c2f so a
                            # step-capped coarse ray never causes a skip)
    steps_per_ray: Optional[jax.Array] = None  # [N] int32 march steps each
                            # ray executed — block-residency/straggler
                            # telemetry (SURVEY.md §5 'Tracing/profiling')
    bracketed: Optional[jax.Array] = None  # [N] bool: ray owns a sign-
                            # change bracket at exit — unresolved+bracketed
                            # rays need a few cheap secant steps, while
                            # unresolved+open rays still aggressive-march;
                            # the multi-round re-binning groups them so
                            # blocks stay work-homogeneous


def live_counts_from_steps(steps_per_ray: jax.Array, max_steps: int) -> jax.Array:
    """Derive per-step live-ray telemetry from final per-ray step counts:
    live_counts[k] = #rays active at the start of step k+1 = #{i: steps_i > k}.
    Restores the masked tracer's live_counts semantics on the fused Pallas
    paths, where counting inside the kernel would cost a carry."""
    s = jnp.clip(steps_per_ray.astype(jnp.int32), 0, max_steps)
    hist = jnp.zeros((max_steps + 1,), jnp.int32).at[s].add(1)
    c = jnp.cumsum(hist)
    return (c[-1] - c[:-1]).astype(jnp.int32)


class RayState(NamedTuple):
    """Dense per-ray march state. d_lo/f_lo track the last outside sample,
    d_hi/f_hi the first inside sample — once both are finite the surface is
    bracketed and stepping switches to guarded secant."""

    d: jax.Array
    active: jax.Array
    hit: jax.Array
    d_lo: jax.Array
    f_lo: jax.Array
    d_hi: jax.Array
    f_hi: jax.Array
    min_sdf: jax.Array
    d_at_min: jax.Array
    last_sdf: jax.Array
    steps: jax.Array        # per-ray step count
    exhausted_open: jax.Array  # hit the per-ray step cap WITHOUT a bracket:
                               # reported as a miss for rendering, but c2f /
                               # phase-B re-binning must not trust the miss


def _init_state(n: int, d0: jax.Array, active: jax.Array) -> RayState:
    f32 = jnp.float32
    return RayState(
        d=d0.astype(f32),
        active=active,
        hit=jnp.zeros((n,), bool),
        d_lo=jnp.full((n,), -_INF, f32),
        f_lo=jnp.full((n,), _INF, f32),
        d_hi=jnp.full((n,), _INF, f32),
        f_hi=jnp.full((n,), -_INF, f32),
        min_sdf=jnp.full((n,), _INF, f32),
        d_at_min=d0.astype(f32),
        last_sdf=jnp.full((n,), _INF, f32),
        steps=jnp.zeros((n,), jnp.int32),
        exhausted_open=jnp.zeros((n,), bool),
    )


def march_step(
    s: RayState,
    sdf: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    t_near: jax.Array,
    far_bound: jax.Array,
    march: MarchConfig,
) -> RayState:
    """One synchronized march update given sdf at the current points.
    Pure function of (state, sdf) — shared by the masked and compaction
    tracers, and by the Pallas-driven path."""
    f = sdf.astype(jnp.float32)

    better = s.active & (f < s.min_sdf)
    min_sdf = jnp.where(better, f, s.min_sdf)
    d_at_min = jnp.where(better, s.d, s.d_at_min)

    # bracket update with the current sample
    outside = f > 0.0
    d_lo = jnp.where(s.active & outside, s.d, s.d_lo)
    f_lo = jnp.where(s.active & outside, f, s.f_lo)
    d_hi = jnp.where(s.active & ~outside, s.d, s.d_hi)
    f_hi = jnp.where(s.active & ~outside, f, s.f_hi)
    bracketed = jnp.isfinite(d_lo) & jnp.isfinite(d_hi)
    width = d_hi - d_lo

    converged = s.active & (
        (jnp.abs(f) < march.convergence_eps)
        | (bracketed & (width < march.depth_eps))
    )

    # next position: aggressive step until bracketed, then guarded secant
    d_aggr = s.d + march.alpha * f
    denom = f_hi - f_lo
    secant = (d_lo * f_hi - d_hi * f_lo) / jnp.where(denom == 0.0, 1.0, denom)
    lo_g = d_lo + 0.05 * width
    hi_g = d_hi - 0.05 * width
    secant = jnp.clip(secant, lo_g, hi_g)
    secant = jnp.where(jnp.isfinite(secant), secant, 0.5 * (d_lo + d_hi))
    # started-inside rays (no d_lo yet): plain backward step pulls them out
    d_back = s.d + f
    d_next = jnp.where(bracketed, secant, jnp.where(outside, d_aggr, d_back))

    steps = s.steps + s.active.astype(jnp.int32)
    exhausted = steps >= march.max_steps
    escaped = (~bracketed) & (
        (d_next > far_bound) | (d_next < t_near - march.far_margin)
    )
    missed = s.active & ~converged & (escaped | exhausted)
    # exhausted-but-bracketed rays: accept the bracket midpoint as the hit
    salvaged = s.active & ~converged & exhausted & bracketed
    missed = missed & ~salvaged
    converged = converged | salvaged

    still = s.active & ~converged & ~missed
    return RayState(
        d=jnp.where(still, d_next, jnp.where(salvaged, 0.5 * (d_lo + d_hi), s.d)),
        active=still,
        hit=s.hit | converged,
        d_lo=d_lo, f_lo=f_lo, d_hi=d_hi, f_hi=f_hi,
        min_sdf=min_sdf,
        d_at_min=d_at_min,
        last_sdf=jnp.where(s.active, f, s.last_sdf),
        steps=steps,
        exhausted_open=s.exhausted_open
        | (s.active & ~converged & exhausted & ~bracketed),
    )


def _ray_init(origins, dirs, march: MarchConfig, init_depth, init_active=None):
    t_near, t_far, enters = ray_sphere_entry(
        origins, dirs, march.sphere_radius, 0.0
    )
    far_bound = t_far + march.far_margin
    t_closest = jnp.maximum(-jnp.sum(origins * dirs, axis=-1), 0.0)
    d0 = jnp.where(enters, t_near, t_closest).astype(jnp.float32)
    if init_depth is not None:
        seeded = jnp.isfinite(init_depth) & enters
        d0 = jnp.where(seeded, jnp.maximum(init_depth, t_near), d0)
    active = enters if init_active is None else (enters & init_active)
    return t_near, far_bound, active, enters, t_closest, d0


def _finalize(out: RayState, origins, dirs, march, enters, t_closest, steps_used, live_counts):
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
        steps_used=steps_used,
        live_counts=live_counts,
        unresolved=out.active | out.exhausted_open,
        steps_per_ray=out.steps,
    )


def sphere_trace(
    sdf_fn: Callable[[jax.Array], jax.Array],
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    init_active: Optional[jax.Array] = None,
) -> TraceResult:
    """Masked dense march: every ray advances each step until all converge
    or terminate; while_loop exits early once no ray is live.

    init_depth: optional [N] per-ray starting distance (NaN = no seed).
    Used by coarse-to-fine (fine rays start just in front of the coarse
    surface estimate — SURVEY.md §7 hard part 5).
    init_active: optional [N] bool — rays marked False never march (the
    coarse-to-fine skip class); their depth stays at init_depth, so the
    renderer's differentiable margin recompute anchors there."""
    n = origins.shape[0]
    t_near, far_bound, active0, enters, t_closest, d0 = _ray_init(
        origins, dirs, march, init_depth, init_active
    )
    state = _init_state(n, d0, active0)
    carry = (state, jnp.zeros((), jnp.int32), jnp.zeros((march.max_steps,), jnp.int32))

    def cond(c):
        s, k, _ = c
        return (k < march.max_steps) & jnp.any(s.active)

    def body(c):
        s, k, live = c
        p = origins + s.d[:, None] * dirs
        f = sdf_fn(p)
        live = jax.lax.dynamic_update_index_in_dim(
            live, jnp.sum(s.active).astype(jnp.int32), k, 0
        )
        s = march_step(s, f, origins, dirs, t_near, far_bound, march)
        return (s, k + 1, live)

    out, steps_used, live_counts = jax.lax.while_loop(cond, body, carry)
    return _finalize(out, origins, dirs, march, enters, t_closest, steps_used, live_counts)


def sphere_trace_compact(
    sdf_fn: Callable[[jax.Array], jax.Array],
    origins: jax.Array,
    dirs: jax.Array,
    march: MarchConfig,
    init_depth: Optional[jax.Array] = None,
    bucket_frac: int = 4,
    inner_steps: int = 16,
    init_active: Optional[jax.Array] = None,
) -> TraceResult:
    """Sphere trace with fixed-shape live-ray compaction — the TPU rebuild
    of the reference's "dynamic synchronized inference" (SURVEY.md §3.1:
    decoder evaluated only on live rays via index_select; §7 hard part 1).

    Scheme (all shapes static, overflow-safe):
      outer while any(active):
        sort ray indices live-first (stable argsort of the active mask);
        gather the first N/bucket_frac rays into a dense bucket;
        march the bucket up to `inner_steps` steps (masked while_loop);
        scatter the bucket state back.
    Live rays beyond bucket capacity wait for a later outer iteration, so
    correctness never depends on how fast the live set shrinks. Total
    decoder work ~= sum over rays of their individual march lengths +
    bucket-tail padding, instead of N * max(steps)."""
    n = origins.shape[0]
    bucket = max(n // bucket_frac, min(n, 256))
    max_outer = (n // bucket + 1) * (
        (march.max_steps + inner_steps - 1) // inner_steps
    ) + 2

    t_near, far_bound, active0, enters, t_closest, d0 = _ray_init(
        origins, dirs, march, init_depth, init_active
    )
    state = _init_state(n, d0, active0)
    carry = (state, jnp.zeros((), jnp.int32), jnp.zeros((max_outer,), jnp.int32))

    def outer_cond(c):
        s, outer, _ = c
        return (outer < max_outer) & jnp.any(s.active)

    def outer_body(c):
        s, outer, live = c
        order = jnp.argsort(jnp.logical_not(s.active), stable=True)
        idx = order[:bucket]
        o_b, v_b = origins[idx], dirs[idx]
        near_b, far_b = t_near[idx], far_bound[idx]
        sub = jax.tree_util.tree_map(lambda a: a[idx], s)

        def inner_cond(t):
            ss, k = t
            return (k < inner_steps) & jnp.any(ss.active)

        def inner_body(t):
            ss, k = t
            p = o_b + ss.d[:, None] * v_b
            f = sdf_fn(p)
            ss = march_step(ss, f, o_b, v_b, near_b, far_b, march)
            return (ss, k + 1)

        sub, _ = jax.lax.while_loop(inner_cond, inner_body, (sub, jnp.zeros((), jnp.int32)))

        live = jax.lax.dynamic_update_index_in_dim(
            live, jnp.sum(s.active).astype(jnp.int32), outer, 0
        )
        s = jax.tree_util.tree_map(
            lambda full, part: full.at[idx].set(part), s, sub
        )
        return (s, outer + 1, live)

    out, _, live_counts = jax.lax.while_loop(outer_cond, outer_body, carry)
    return _finalize(
        out, origins, dirs, march, enters, t_closest,
        jnp.max(out.steps), live_counts,
    )
