"""Inverse-rendering loss library.

Reference analog: loss utilities in ``core/utils/`` of
B1ueber2y/DIST-Renderer (SURVEY.md §2 'Loss library'): masked L1 depth loss,
silhouette (min-SDF) loss, multi-view photometric-consistency loss via
depth-based cross-view warping, latent-norm regularizer.

All losses are plain pure functions over arrays -> scalar, so they compose
under jit/grad/vmap and psum cleanly across mesh axes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dist_renderer_tpu.ops.camera import Camera, project


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean L1 over valid pixels; safe when the mask is empty."""
    m = mask.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / denom


def masked_l2(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(pred.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(((pred - target) ** 2) * m) / denom


def depth_loss(
    pred_depth: jax.Array,
    obs_depth: jax.Array,
    obs_valid: jax.Array,
    pred_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked-L1 depth loss over pixels observed AND rendered (the
    reference compares only where both the observation and the render have
    geometry — SURVEY.md §3.3)."""
    valid = obs_valid if pred_mask is None else (obs_valid & pred_mask)
    return masked_l1(pred_depth, obs_depth, valid)


def silhouette_loss(
    min_sdf: jax.Array, obs_mask: jax.Array, margin: float = 0.0
) -> jax.Array:
    """DIST's min-SDF silhouette loss (SURVEY.md §3.1, §6 hard part 6):
    inside the observed mask the ray should reach the surface
    (penalize min_sdf > 0); outside, the shape must clear the ray
    (penalize min_sdf < margin). Differentiable through the min-SDF
    recompute at the recorded closest point."""
    inside = obs_mask.astype(min_sdf.dtype)
    outside = 1.0 - inside
    loss_in = jnp.maximum(min_sdf, 0.0) * inside
    loss_out = jnp.maximum(margin - min_sdf, 0.0) * outside
    return jnp.mean(loss_in + loss_out)


def latent_reg(latent: jax.Array) -> jax.Array:
    """DeepSDF latent prior ||z||^2 (SURVEY.md §3.3)."""
    return jnp.sum(latent**2)


def bilinear_sample(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Differentiable bilinear sampling. img [H,W,C]; uv [N,2] in pixel
    coords (u=x, v=y). Out-of-bounds clamps to the border."""
    h, w = img.shape[0], img.shape[1]
    u = jnp.clip(uv[:, 0], 0.0, w - 1.001)
    v = jnp.clip(uv[:, 1], 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1, v1 = u0 + 1, v0 + 1
    fu = (u - u0.astype(u.dtype))[:, None]
    fv = (v - v0.astype(v.dtype))[:, None]
    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]
    return (
        i00 * (1 - fu) * (1 - fv)
        + i01 * fu * (1 - fv)
        + i10 * (1 - fu) * fv
        + i11 * fu * fv
    )


def photometric_loss(
    surface_points: jax.Array,
    hit_mask: jax.Array,
    img_i: jax.Array,
    cam_i: Camera,
    img_j: jax.Array,
    cam_j: Camera,
) -> jax.Array:
    """Multi-view photometric consistency (SURVEY.md §3.4): surface points
    recovered from view i are projected into BOTH view i and view j; the
    sampled colors must agree. Gradients reach the geometry through the
    (differentiable) surface points.

    surface_points: [N,3] world points from view i's render.
    hit_mask: [N] bool — rays of view i that hit the surface.
    img_*: [H,W,C] float images.
    """
    uv_i, z_i = project(cam_i, surface_points)
    uv_j, z_j = project(cam_j, surface_points)
    ci = bilinear_sample(img_i, uv_i)
    cj = bilinear_sample(img_j, uv_j)
    # only count points in front of both cameras and inside view j
    h, w = img_j.shape[0], img_j.shape[1]
    in_j = (
        (uv_j[:, 0] >= 0) & (uv_j[:, 0] <= w - 1)
        & (uv_j[:, 1] >= 0) & (uv_j[:, 1] <= h - 1)
        & (z_j > 0)
    )
    m = (hit_mask & in_j).astype(ci.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.abs(ci - cj) * m) / denom


def normal_loss(
    pred_normal: jax.Array, obs_normal: jax.Array, mask: jax.Array
) -> jax.Array:
    """1 - cos similarity over valid pixels (optional term)."""
    cos = jnp.sum(pred_normal * obs_normal, axis=-1)
    m = mask.astype(cos.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum((1.0 - cos) * m) / denom
