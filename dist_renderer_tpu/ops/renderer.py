"""Differentiable rendering: march (no grad) + one differentiable recompute.

This is the rebuild of ``SDFRenderer`` in the reference's
``core/sdfrenderer/renderer.py`` (SURVEY.md §3.1-§3.2). The single most
important design fact carries over: the march runs entirely without
gradient tracking, and the returned depth is re-expressed as

    depth = stop_gradient(d*) + f_theta(z, o + stop_gradient(d*) . v)

so gradients w.r.t. the latent code, decoder params, and camera pose flow
only through ONE decoder evaluation at the surface (memory flat in march
steps). An optional "ift" mode divides by the stop-gradient'ed directional
derivative (the exact implicit-function-theorem Jacobian), which is better
conditioned at grazing angles.

`sdf_fn(latent, points) -> sdf` is any latent-conditioned SDF — a bound
neural decoder or an analytic oracle.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import DecoderConfig, RenderConfig
from dist_renderer_tpu.models.decoder import decoder_apply
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.tracer import TraceResult, sphere_trace

_sg = jax.lax.stop_gradient


class RenderOutput(NamedTuple):
    """Rendered maps. Flat [N] from render_rays; [H,W] from render()."""

    depth: jax.Array       # differentiable depth (background sentinel where miss)
    mask: jax.Array        # bool hit mask (non-differentiable)
    normal: jax.Array      # [*, 3] unit surface normal (0 where miss)
    min_sdf: jax.Array     # differentiable per-ray min-SDF margin (silhouette)
    points: jax.Array      # [*, 3] surface points (differentiable via depth)
    trace: TraceResult     # raw march diagnostics (all stop-gradient)


def _spatial_grad(sdf_fn, latent, points):
    """d sdf / d x per point in one backward pass (sum trick)."""
    return jax.grad(lambda p: jnp.sum(sdf_fn(latent, p)))(points)


def render_rays(
    sdf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    cfg: RenderConfig,
) -> RenderOutput:
    """Trace + differentiable composition for a flat ray batch [N, 3]."""
    march_fn = lambda p: sdf_fn(_sg(latent), p)
    trace = sphere_trace(march_fn, _sg(origins), _sg(dirs), cfg.march)
    trace = jax.tree_util.tree_map(_sg, trace)

    d0 = trace.depth
    p_surf = origins + d0[:, None] * dirs          # origins/dirs stay live (pose grads)
    s = sdf_fn(latent, p_surf)                     # THE differentiable eval

    g = _spatial_grad(sdf_fn, latent, p_surf)
    if cfg.grad.mode == "ift":
        # f(z, o + d(z,o,v) v) == 0  =>  dd = -df / (grad_x f . v)
        denom = jnp.sum(_sg(g) * _sg(dirs), axis=-1)
        denom = jnp.minimum(denom, -cfg.grad.ift_min_denom)  # front-facing: < 0
        depth = d0 - s / denom
    else:  # "last_step" (DIST default): one unit marching step
        depth = d0 + s

    depth = jnp.where(trace.hit, depth, cfg.background_depth)

    # Differentiable silhouette margin: re-evaluate the decoder at the
    # recorded min-SDF point (SURVEY.md §3.2: "the silhouette's min-SDF
    # sample is similarly recomputed differentiably at its recorded point").
    p_min = origins + trace.depth_at_min[:, None] * dirs
    min_sdf = sdf_fn(latent, p_min)

    # Normals: grad_x f at the surface, normalized. Differentiable w.r.t.
    # latent (useful for normal-map losses); central differences optional.
    if cfg.normal_eps > 0.0:
        eps = cfg.normal_eps
        offs = jnp.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            p_surf.dtype,
        ) * eps
        probe = (p_surf[:, None, :] + offs[None, :, :]).reshape(-1, 3)
        sv = sdf_fn(latent, probe).reshape(-1, 6)
        g = jnp.stack(
            [sv[:, 0] - sv[:, 1], sv[:, 2] - sv[:, 3], sv[:, 4] - sv[:, 5]], axis=-1
        ) / (2.0 * eps)
    normal = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    normal = jnp.where(trace.hit[:, None], normal, 0.0)

    p_out = origins + depth[:, None] * dirs
    return RenderOutput(
        depth=depth, mask=trace.hit, normal=normal, min_sdf=min_sdf,
        points=p_out, trace=trace,
    )


@functools.partial(jax.jit, static_argnums=(0, 3))
def render(
    sdf_fn: Callable[[jax.Array, jax.Array], jax.Array],
    latent: jax.Array,
    camera: Camera,
    cfg: RenderConfig = RenderConfig(),
) -> RenderOutput:
    """Full-frame render: camera -> [H, W] maps.

    Mirrors the reference's ``SDFRenderer.render(latent, R, T)`` surface
    (depth + normal + silhouette in one pass)."""
    origins, dirs = pixel_rays(camera, cfg.img_h, cfg.img_w)
    out = render_rays(sdf_fn, latent, origins, dirs, cfg)
    hw = (cfg.img_h, cfg.img_w)
    return RenderOutput(
        depth=out.depth.reshape(hw),
        mask=out.mask.reshape(hw),
        normal=out.normal.reshape(hw + (3,)),
        min_sdf=out.min_sdf.reshape(hw),
        points=out.points.reshape(hw + (3,)),
        trace=out.trace,
    )


class SDFRenderer:
    """OO wrapper mirroring the reference's ``SDFRenderer`` class API
    (core/sdfrenderer/renderer.py): constructed from a decoder + intrinsics
    + image size; exposes render / render_depth / render_normal /
    render_silhouette taking (latent, R, T)."""

    def __init__(
        self,
        decoder_params,
        intrinsic: jax.Array,
        img_hw: Tuple[int, int] = (256, 256),
        decoder_cfg: DecoderConfig = DecoderConfig(),
        cfg: Optional[RenderConfig] = None,
        sdf_fn: Optional[Callable] = None,
    ):
        import dataclasses

        self.K = jnp.asarray(intrinsic, jnp.float32)
        base = cfg or RenderConfig()
        self.cfg = dataclasses.replace(base, img_h=img_hw[0], img_w=img_hw[1])
        if sdf_fn is None:
            params = decoder_params
            dcfg = decoder_cfg
            dtype = self.cfg.dtype
            sdf_fn = lambda z, p: decoder_apply(params, z, p, dcfg, dtype)
        self.sdf_fn = sdf_fn

    def _camera(self, R, T) -> Camera:
        return Camera(K=self.K, R=jnp.asarray(R, jnp.float32), T=jnp.asarray(T, jnp.float32))

    def render(self, latent, R, T) -> RenderOutput:
        return render(self.sdf_fn, latent, self._camera(R, T), self.cfg)

    def render_depth(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).depth

    def render_normal(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).normal

    def render_silhouette(self, latent, R, T) -> jax.Array:
        return self.render(latent, R, T).min_sdf
