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
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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

    H*W must divide evenly by the axis size (use image sizes that are
    multiples of the mesh — 256/512 squares always are)."""
    n_shards = mesh.shape[ray_axis]
    n_rays = cfg.img_h * cfg.img_w
    if n_rays % n_shards:
        raise ValueError(f"{n_rays} rays not divisible by {n_shards} shards")

    origins, dirs = pixel_rays(camera, cfg.img_h, cfg.img_w)

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
    return RenderOutput(
        depth=out.depth.reshape(hw),
        mask=out.mask.reshape(hw),
        normal=out.normal.reshape(hw + (3,)),
        min_sdf=out.min_sdf.reshape(hw),
        points=out.points.reshape(hw + (3,)),
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
