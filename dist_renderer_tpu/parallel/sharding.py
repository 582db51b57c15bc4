"""shard_map rendering and sharded inverse-rendering steps.

Design (SURVEY.md §2 parallelism table, §5 'Distributed communication
backend'):

  - The march is embarrassingly parallel over rays: `render_rays` runs
    inside `shard_map` with the pixel axis split over the "rays" mesh axis.
    Each shard's `lax.while_loop` exits when ITS rays converge — faster
    than a global loop that waits for the slowest ray on any chip, and
    zero communication during the march.
  - Latent/view batches shard over the "latents" axis (pure DP).
  - The ONLY collectives are `psum` of loss/grad over the rays axis (the
    shared latent receives gradient from every ray shard) and gathers at
    the output boundary — exactly the JAX-collectives rebuild of what the
    reference never had (it is single-GPU).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from dist_renderer_tpu.config import LossConfig, RenderConfig
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import RenderOutput, render_rays
from dist_renderer_tpu.utils import losses as L


def render_frame_sharded(
    sdf_fn: Callable,
    latent: jax.Array,
    camera: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
    ray_axis: str = "rays",
):
    """Render one frame with pixels sharded across `ray_axis`.

    Ray counts that don't divide the axis size are padded with dummy rays
    (marched like any other, trimmed from the output) — arbitrary image
    sizes work on any mesh."""
    from dist_renderer_tpu.parallel.mesh import pad_to_multiple

    n_shards = mesh.shape[ray_axis]
    n_rays = cfg.img_h * cfg.img_w

    origins, dirs = pixel_rays(camera, cfg.img_h, cfg.img_w)
    n_padded = pad_to_multiple(n_rays, n_shards)
    if n_padded != n_rays:
        pad = n_padded - n_rays
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        # unit-ish dummy direction: padding rays march harmlessly
        dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(ray_axis), P(ray_axis)),
        out_specs=P(ray_axis),
        check_vma=False,
    )
    def _shard(lat, o, v):
        out = render_rays(sdf_fn, lat, o, v, cfg)
        # drop scalar/step-shaped trace fields that cannot shard over rays
        return RenderOutput(
            depth=out.depth, mask=out.mask, normal=out.normal,
            min_sdf=out.min_sdf, points=out.points,
            trace=None,
        )

    out = _shard(latent, origins, dirs)
    hw = (cfg.img_h, cfg.img_w)
    trim = lambda a: a[:n_rays]
    return RenderOutput(
        depth=trim(out.depth).reshape(hw),
        mask=trim(out.mask).reshape(hw),
        normal=trim(out.normal).reshape(hw + (3,)),
        min_sdf=trim(out.min_sdf).reshape(hw),
        points=trim(out.points).reshape(hw + (3,)),
        trace=None,
    )


def render_views_sharded(
    sdf_fn: Callable,
    latent: jax.Array,
    origins: jax.Array,   # [V, N, 3]
    dirs: jax.Array,      # [V, N, 3]
    cfg: RenderConfig,
    mesh: Mesh,
    view_axis: str = "latents",
):
    """Multi-view render with views sharded across chips (SURVEY.md §2
    'View parallel': shard views across chips for config #3). The shared
    latent is replicated; each chip renders its view shard independently
    — no communication during the march; grads over the shared latent
    psum at the loss boundary (in the caller's grad)."""
    n_shards = mesh.shape[view_axis]
    if origins.shape[0] % n_shards:
        raise ValueError(
            f"{origins.shape[0]} views not divisible by {n_shards} shards"
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(view_axis), P(view_axis)),
        out_specs=P(view_axis),
        check_vma=False,
    )
    def _shard(lat, o, v):
        def one(o1, v1):
            out = render_rays(sdf_fn, lat, o1, v1, cfg)
            return RenderOutput(
                depth=out.depth, mask=out.mask, normal=out.normal,
                min_sdf=out.min_sdf, points=out.points, trace=None,
            )

        return jax.vmap(one)(o, v)

    return _shard(latent, origins, dirs)


def trace_sharded_pallas(
    packed,
    origins: jax.Array,
    dirs: jax.Array,
    march,
    mesh: Mesh,
    ray_axis: str = "rays",
    block: int = 512,
    interpret: bool = False,
):
    """Multi-chip fused-kernel trace: each chip runs the Pallas persistent
    march on its ray shard (communication-free — SURVEY.md §2: 'each chip
    marches its ray shard; no cross-chip traffic during the march').

    packed: ops.pallas.fused_march.PackedDecoder (weights replicate onto
    every chip; 3.6 MB bf16). Returns (depth, hit, min_sdf) sharded over
    `ray_axis`. interpret=True allows CPU-mesh testing."""
    from dist_renderer_tpu.ops.pallas.fused_march import pallas_sphere_trace

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(ray_axis), P(ray_axis)),
        out_specs=(P(ray_axis), P(ray_axis), P(ray_axis)),
        check_vma=False,
    )
    def _shard(o, v):
        r = pallas_sphere_trace(
            packed, o, v, march, block=block, interpret=interpret
        )
        return r.depth, r.hit, r.min_sdf

    return _shard(origins, dirs)


def render_batched_c2f_sharded(
    params,
    dcfg,
    latents: jax.Array,            # [F, L]
    origins: jax.Array,            # [F, H*W, 3] row-major pixel rays
    dirs: jax.Array,               # [F, H*W, 3]
    img_hw: Tuple[int, int],
    march,
    mesh: Mesh,
    frame_axis: str = "latents",
    ray_axis: str = "rays",
    block: int = 512,
    strides: Tuple[int, ...] = (16, 4),
    coarse_steps: int = 16,
    backoff: float = 0.05,
    interpret: bool = False,
    round_caps: Tuple[int, ...] = (4, 12),
    shared_origin: bool = False,
    scheduler: str = "rounds",
    queue_caps: Tuple[int, ...] = (1, 2, 6, 16),
    queue_dense_frac: float = 0.5,
):
    """Config-#5 flagship at scale: the multi-frame fused kernel composed
    with shard_map over a 2-D mesh (SURVEY.md §2 parallelism table row 3:
    '1k latents x 16 views sharded over latents x rays').

    Layout: frames shard over `frame_axis` (independent bias-bank columns
    — pure data parallel, weights replicate); each frame's rays shard over
    `ray_axis` as horizontal image BANDS. The c2f classification needs each
    coarse cell's 3x3 neighborhood, so bands exchange ONE boundary coarse
    row with their neighbors per level via `lax.ppermute` (the only
    communication — a few KB per level, rides ICI), making the sharded
    plan STRUCTURALLY equal to the single-device plan: window reductions
    use the received halo rows in-band and the reduction identities
    (inf/False/True) at true image edges, which reproduces SAME-padding
    truncation. The march itself is communication-free per ray.

    Exactness caveat (measured): XLA's ray-setup math (sphere entry,
    norms) differs at the 1-ULP level across batch SHAPES (a band vs the
    full frame), and a 1-ulp seed wiggle can flip a secant branch — so
    isolated rays (<0.5%) may land within ~2x depth_eps of the
    single-device depth while classes/hit masks agree. See
    tests/test_parallel_batched.py for the contract.

    Restrictions: H divisible by max(strides) * mesh[ray_axis] for every
    valid level. Returns (depth, hit, min_sdf), each [F, H*W].

    scheduler: "rounds" (sort re-binning — batched-throughput winner) |
    "queue" (one-launch work-queue per shard, each chip walks its own
    band's queue in parallel — the multi-chip single-frame LATENCY path)
    | "auto" (queue when each shard holds one frame). Both are
    semantically one uninterrupted full-budget march, so the plan-exact
    guarantee holds for either.
    """
    import dataclasses as _dc

    from dist_renderer_tpu.ops.c2f import classify_pyramid, plan_from_maps
    from dist_renderer_tpu.ops.pallas.batched_march import (
        batched_trace_padded, fine_march_rounds, fold_bias_bank, pack_shared,
    )

    h, w = img_hw
    n_rb = mesh.shape[ray_axis]
    n_fb = mesh.shape[frame_axis]
    if latents.shape[0] % n_fb:
        raise ValueError(f"{latents.shape[0]} frames not divisible by {n_fb}")
    h_loc = h // n_rb
    valid = tuple(
        s for s in strides
        if s > 1 and h_loc % s == 0 and w % s == 0 and h % (s * n_rb) == 0
    )
    if not valid:
        raise ValueError(
            f"no stride of {strides} divides band {h_loc}x{w} "
            f"({n_rb} ray shards of a {h}x{w} image)"
        )
    shared = pack_shared(params, dcfg)
    coarse_march = _dc.replace(march, max_steps=min(march.max_steps, coarse_steps))

    def _halo_rows(grid, neutral):
        """grid [F_loc, hc, wc] -> (top_halo, bot_halo) [F_loc, wc]:
        neighbor boundary rows via ppermute; reduction identities at the
        true image edges (shard 0's top / shard k-1's bottom)."""
        k = n_rb
        idx = jax.lax.axis_index(ray_axis)
        # my LAST row -> next shard's top halo
        from_prev = jax.lax.ppermute(
            grid[:, -1, :], ray_axis, [(i, i + 1) for i in range(k - 1)]
        )
        # my FIRST row -> previous shard's bottom halo
        from_next = jax.lax.ppermute(
            grid[:, 0, :], ray_axis, [(i + 1, i) for i in range(k - 1)]
        )
        top = jnp.where(idx == 0, neutral, from_prev)
        bot = jnp.where(idx == k - 1, neutral, from_next)
        return top, bot

    def _windows(grid, op, neutral):
        """3x3 window reduce over [F_loc, hc, wc] with halo rows on the
        band axis and identity padding on the lane axis (== SAME)."""
        top, bot = _halo_rows(grid, neutral)
        ext = jnp.concatenate([top[:, None, :], grid, bot[:, None, :]], axis=1)
        return jax.lax.reduce_window(
            ext, neutral, op, (1, 3, 3), (1, 1, 1),
            padding=((0, 0), (0, 0), (1, 1)),
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(frame_axis),
            P(frame_axis, ray_axis), P(frame_axis, ray_axis),
        ),
        out_specs=(
            P(frame_axis, ray_axis), P(frame_axis, ray_axis),
            P(frame_axis, ray_axis),
        ),
        check_vma=False,
    )
    def _shard(lat, o, v):
        f_loc = lat.shape[0]
        bank = fold_bias_bank(params, lat, dcfg, shared)

        def trace_level(o_l, v_l, lvl_seed, lvl_active, stride):
            return batched_trace_padded(
                shared, bank, o_l, v_l, coarse_march, lvl_seed,
                lvl_active, block, interpret,
            )

        # shared classification pipeline with the halo-exchanging window
        # reduce — the ONLY difference from the single-device plan, and it
        # reproduces SAME-padding truncation bitwise (plan-exact)
        maps = classify_pyramid(
            trace_level,
            o.reshape(f_loc, h_loc, w, 3),
            v.reshape(f_loc, h_loc, w, 3),
            valid, backoff, windows=_windows,
        )
        key, init_depth, skip = plan_from_maps(maps)
        margin = maps.margin.reshape(f_loc, -1)
        o_in = o[:, :1, :] if shared_origin else o
        sched = scheduler
        if sched == "auto":
            sched = "queue" if f_loc == 1 else "rounds"
        if sched == "queue":
            from dist_renderer_tpu.ops.pallas.queue_march import queue_march

            d, hit, msdf, _dam, _lastf, _steps, _unres = queue_march(
                shared, bank, o_in, v, key, init_depth, march,
                block=block, gen_caps=queue_caps,
                dense_frac=queue_dense_frac, interpret=interpret,
            )
        else:
            d, hit, msdf = fine_march_rounds(
                shared, bank, o_in, v, key, init_depth, march,
                block=block, round_caps=round_caps, interpret=interpret,
            )
        msdf = jnp.where(skip, margin, msdf)
        return d, hit, msdf

    return _shard(latents, origins, dirs)


def make_sharded_fit_step(
    sdf_fn: Callable,
    cfg: RenderConfig,
    loss_cfg: LossConfig,
    mesh: Mesh,
    latent_axis: str = "latents",
    ray_axis: str = "rays",
    optimizer=None,
):
    """Build the jitted multi-chip training step for batched latent fitting
    (config #5-style: many shapes at once, each frame's rays sharded).

    Layout: latents [B, L] sharded over `latent_axis`; observations
    [B, N_rays] sharded (B over latents, N over rays). Each device owns a
    (b_loc, n_loc) tile. Gradient w.r.t. a latent psums over the ray axis
    only — latents are independent across the latent axis (no collective).

    Returns step(latents, opt_state, origins, dirs, obs_depth, obs_mask)
    -> (latents, opt_state, loss).
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-2)

    def local_loss(lat_tile, o_tile, v_tile, d_tile, m_tile):
        # lat_tile [b,L]; o/v [b,n,3]; d/m [b,n]
        def one(lat, o, v, d, m):
            out = render_rays(sdf_fn, lat, o, v, cfg)
            ld = L.depth_loss(out.depth, d, m, out.mask)
            ls = L.silhouette_loss(out.min_sdf, m)
            return loss_cfg.w_depth * ld + loss_cfg.w_silhouette * ls \
                + loss_cfg.w_latent_reg * L.latent_reg(lat)

        per_shape = jax.vmap(one)(lat_tile, o_tile, v_tile, d_tile, m_tile)
        return jnp.sum(per_shape)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(latent_axis), P(latent_axis, ray_axis), P(latent_axis, ray_axis),
            P(latent_axis, ray_axis), P(latent_axis, ray_axis),
        ),
        out_specs=(P(latent_axis), P()),
        check_vma=False,
    )
    def grad_shard(lat, o, v, d, m):
        loss, g = jax.value_and_grad(local_loss)(lat, o, v, d, m)
        # rays of one shape live on several chips: sum their latent grads
        g = jax.lax.psum(g, ray_axis)
        loss = jax.lax.psum(loss, (latent_axis, ray_axis))
        return g, loss

    @jax.jit
    def step(latents, opt_state, origins, dirs, obs_depth, obs_mask):
        grads, loss = grad_shard(latents, origins, dirs, obs_depth, obs_mask)
        updates, opt_state = optimizer.update(grads, opt_state, latents)
        latents = optax.apply_updates(latents, updates)
        return latents, opt_state, loss

    return step, optimizer
