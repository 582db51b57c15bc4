"""THE coarse-to-fine classification pipeline, shared by every renderer.

One implementation of the multi-level coarse pyramid + 3x3-window ray
classification (SURVEY.md §3.1 'coarse-to-fine', rebuilt with static
shapes), consumed by:

  - ops/renderer.py::c2f_plan            (single-frame split plan/trace)
  - ops/pallas/batched_march.py::render_batched_c2f   (config-#5 path)
  - parallel/sharding.py::render_batched_c2f_sharded  (multi-chip path,
    which injects halo-exchanging window reductions so the sharded plan
    is EXACTLY the single-device plan)

These previously carried three copies of the same
coarse-march -> 3x3 window -> classify -> seed pipeline; the sharded
path's "plan-exact" guarantee depended on all three evolving in lockstep
(round-2 VERDICT "what's weak" #2). Callers now differ only in how a
coarse level is traced (`trace_level`) and how windows reduce across
shard boundaries (`windows`).

Classification semantics (the TPU rebuild of the reference's dynamic ray
subdivision, core/sdfrenderer/renderer.py [R] — one sort per frame
instead of per-step index bookkeeping):

  - all 3x3 coarse neighbors hit -> INTERIOR: seed at (min neighbor
    depth - backoff); where the window is depth-FLAT (range below the
    backoff) the surface is locally planar and a tight 0.2x backoff
    saves ~5 march steps per ray without overshoot risk.
  - no neighbor hit -> SKIP: fine march skipped entirely; the margin
    anchor is the coarse min-SDF depth so the differentiable silhouette
    recompute samples there.
  - mixed -> RIM: full march (O(perimeter) rays).

Safety rule: a step-capped coarse ray that is still UNRESOLVED counts as
a hit for the skip decision, so no fine ray is ever wrongly skipped.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class C2FMaps(NamedTuple):
    """Full-resolution per-pixel planning maps, all [F, H, W]."""

    seed: jax.Array      # fine seed depth (NaN = start at sphere entry)
    hit_any: jax.Array   # bool: any coarse neighbor hit-or-unresolved
    hit_all: jax.Array   # bool: all coarse neighbors strictly hit
    anchor: jax.Array    # coarse min-SDF depth (miss-ray margin anchor)
    margin: jax.Array    # coarse min-SDF value (skip-ray silhouette)
    width: jax.Array     # coarse 3x3 depth range (diagnostics)


def default_windows(grid: jax.Array, op, neutral) -> jax.Array:
    """3x3 SAME window reduce over [F, hc, wc] (single-device layout)."""
    return jax.lax.reduce_window(
        grid, neutral, op, (1, 3, 3), (1, 1, 1), "SAME"
    )


def classify_pyramid(
    trace_level: Callable,
    o_g: jax.Array,          # [F, H, W, 3]
    v_g: jax.Array,          # [F, H, W, 3]
    strides: Sequence[int],  # coarse levels, coarsest first (e.g. (16, 4));
                             # caller pre-filters for divisibility
    backoff: float,
    windows: Callable = default_windows,
) -> Optional[C2FMaps]:
    """Run the coarse pyramid and build full-res classification maps.

    trace_level(o, v, seed, active, stride) -> object with [F, R] fields
    .depth .hit .unresolved .depth_at_min .min_sdf (a TraceResult or
    anything duck-typed to it). seed is None at the coarsest level.

    Returns None when `strides` is empty (caller falls back to a plain
    full-resolution march).

    Layout note (round-4 glue work): all inter-level state is carried at
    the CURRENT level's coarse resolution and upsampled to full res ONCE
    at the end. The previous implementation round-tripped every field
    through full resolution at every level (6 maps x [F, H, W] writes per
    level — pure HBM glue, ~measured in scripts/diag_f1_stages.py). For
    nested strides (each stride divisible by the next — every production
    config) the result is BIT-IDENTICAL: up-then-subsample and
    resample-then-up agree because ((i//a)*a)//b == i//b when a | b
    (tests/test_c2f.py::test_classify_pyramid_matches_fullres_reference).
    For non-nested strides the anchor/margin a level-skipped ray inherits
    may come from the neighboring parent cell (same neighborhood, equally
    valid coarse sample); classification safety is unaffected."""
    f, h, w = o_g.shape[:3]
    maps: Optional[C2FMaps] = None
    prev_stride = 0

    def resample(g, s_from, s_to):
        """Coarse grid at stride s_from -> grid at (finer) stride s_to:
        g_out[j] = g[(j * s_to) // s_from] per axis — exactly the
        up-to-full-res-then-[::s_to] mapping of the fullres layout."""
        jr = (jnp.arange(h // s_to) * s_to) // s_from
        jc = (jnp.arange(w // s_to) * s_to) // s_from
        return g[:, jr][:, :, jc]

    for stride in strides:
        hh, ww = h // stride, w // stride
        o_l = o_g[:, ::stride, ::stride].reshape(f, -1, 3)
        v_l = v_g[:, ::stride, ::stride].reshape(f, -1, 3)
        if maps is None:
            seed = None
            active = jnp.ones((f, hh * ww), bool)
        else:
            # level-wise skip: coarse rays whose parent neighborhood
            # missed entirely never re-march — background cost is paid
            # only at the coarsest level. Their margin anchor propagates
            # down in the seed slot.
            down = lambda g: resample(g, prev_stride, stride)
            seed = down(maps.seed).reshape(f, -1)
            active = down(maps.hit_any).reshape(f, -1)
            seed = jnp.where(active, seed, down(maps.anchor).reshape(f, -1))
        res = trace_level(o_l, v_l, seed, active, stride)

        # seedable depth: converged depth for hits; for step-capped
        # UNRESOLVED rays the current march distance (a safe lower bound
        # on their surface distance — partial progress is not wasted)
        seedable = res.hit | res.unresolved
        depth_grid = jnp.where(seedable, res.depth, jnp.inf).reshape(
            f, hh, ww
        )
        hitish = seedable.reshape(f, hh, ww)
        strict = res.hit.reshape(f, hh, ww)

        dmin = windows(depth_grid, jax.lax.min, jnp.inf)
        dmax = windows(
            jnp.where(jnp.isfinite(depth_grid), depth_grid, -jnp.inf),
            jax.lax.max, -jnp.inf,
        )
        hit_any = windows(hitish, jax.lax.bitwise_or, False)
        hit_all = windows(strict, jax.lax.bitwise_and, True)

        # tight seeds on depth-flat windows (relaxing coarse convergence
        # eps instead was tried and REGRESSED: block residency is a max,
        # and looser coarse depth poisons tight seeds)
        rng = dmax - dmin
        bo = jnp.where(rng < backoff, 0.2 * backoff, backoff)
        # margin/anchor come from the last level at which a ray was
        # ACTIVELY marched: a level-skipped ray's tracer output is the
        # inactive-ray sentinel (the geometric bounding-sphere margin —
        # NEGATIVE for any ray whose line crosses the sphere), not a
        # field sample. Taking the last level unconditionally handed
        # every deep-background ray a bogus near-zero/negative margin;
        # the proxy verify stage's near-miss band test (and silhouette
        # losses reading skip-ray margins) need the real coarse min-SDF.
        new_anchor = res.depth_at_min.reshape(f, hh, ww)
        new_margin = res.min_sdf.reshape(f, hh, ww)
        if maps is not None:
            act_g = active.reshape(f, hh, ww)
            down = lambda g: resample(g, prev_stride, stride)
            new_anchor = jnp.where(act_g, new_anchor, down(maps.anchor))
            new_margin = jnp.where(act_g, new_margin, down(maps.margin))
        maps = C2FMaps(
            seed=jnp.where(jnp.isfinite(dmin), dmin - bo, jnp.nan),
            hit_any=hit_any,
            hit_all=hit_all,
            anchor=new_anchor,
            margin=new_margin,
            width=jnp.where(jnp.isfinite(rng), rng, jnp.inf),
        )
        prev_stride = stride

    if maps is None:
        return None
    # ONE upsample to full resolution (replication: full pixel i reads
    # coarse cell i // stride, both axes)
    up = lambda g: jnp.repeat(jnp.repeat(g, prev_stride, 1), prev_stride, 2)
    return C2FMaps(*(up(g) for g in maps))


def warm_maps(
    depth: jax.Array,      # [F, H*W] previous iteration's depth
    hitish: jax.Array,     # [F, H*W] bool: prev hit OR unresolved
    anchor: jax.Array,     # [F, H*W] prev depth_at_min (margin anchors)
    margin: jax.Array,     # [F, H*W] prev min_sdf (skip-ray silhouette)
    img_hw: Tuple[int, int],
    backoff: float,
    dilate: int = 4,
    windows: Callable = default_windows,
) -> C2FMaps:
    """Classification maps from the PREVIOUS optimizer iteration's trace
    instead of a coarse pyramid (SURVEY.md §3.3-3.5: configs #2-#4 render
    the SAME camera hundreds of times while latent/pose move slightly —
    iteration k's depth map is a near-perfect interior seed for k+1).

    Same contract as classify_pyramid's output, built from stride-1
    windows: interior = 3x3 all-hit (seed at window-min - backoff), skip =
    nothing hit within a (2*dilate+1)^2 window — the dilation is the
    safety margin for inter-iteration silhouette motion; rays the shape
    could newly cover stay rim and get a full march. Unresolved-at-exit
    rays count as hits (never wrongly skipped), mirroring the pyramid's
    safety rule. Callers should still refresh with a full pyramid render
    every N steps (the dilation bounds per-step motion, not drift)."""
    f = depth.shape[0]
    h, w = img_hw
    dg = jnp.where(hitish, depth, jnp.inf).reshape(f, h, w)
    hg = hitish.reshape(f, h, w)

    dmin = windows(dg, jax.lax.min, jnp.inf)
    dmax = windows(
        jnp.where(jnp.isfinite(dg), dg, -jnp.inf), jax.lax.max, -jnp.inf
    )
    hit_all = windows(hg, jax.lax.bitwise_and, True)
    hit_any = hg
    for _ in range(max(dilate, 1)):   # iterated 3x3 OR = (2k+1)^2 dilation
        hit_any = windows(hit_any, jax.lax.bitwise_or, False)

    rng = dmax - dmin
    bo = jnp.where(rng < backoff, 0.2 * backoff, backoff)
    return C2FMaps(
        seed=jnp.where(jnp.isfinite(dmin), dmin - bo, jnp.nan),
        hit_any=hit_any,
        hit_all=hit_all,
        anchor=anchor.reshape(f, h, w),
        margin=margin.reshape(f, h, w),
        width=jnp.where(jnp.isfinite(rng), rng, jnp.inf),
    )


def plan_from_maps(maps: C2FMaps) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flatten maps into the per-ray plan: (key, init_depth, skip), each
    [F, H*W]. key: 0 = rim (full march), 1 = interior (tight seed),
    2 = skip (never marched; margin anchored at the coarse min-SDF)."""
    f = maps.seed.shape[0]
    seed = maps.seed.reshape(f, -1)
    hit_any = maps.hit_any.reshape(f, -1)
    hit_all = maps.hit_all.reshape(f, -1)
    anchor = maps.anchor.reshape(f, -1)

    skip = ~hit_any
    rim = hit_any & ~hit_all
    key = jnp.where(rim, 0, jnp.where(hit_all, 1, 2)).astype(jnp.int32)
    init_depth = jnp.where(skip, anchor, seed)
    return key, init_depth, skip
