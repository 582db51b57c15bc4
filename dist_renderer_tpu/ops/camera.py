"""Pinhole camera model and ray generation.

Reference analog: camera/geometry utilities in ``core/utils/`` of
B1ueber2y/DIST-Renderer (SURVEY.md §1 L2): intrinsic K, extrinsic [R|t]
(world->camera, x_cam = R @ x_world + T), pixel grid -> unit world-space ray
directions, camera center, and continuous rotation parameterizations so the
extrinsics can be optimization variables (pose estimation, SURVEY.md §3.5).

The Camera is a NamedTuple => a JAX pytree: it can be vmap'ed over (batched
cameras for multi-view), donated, sharded, and differentiated through.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole camera. K: [3,3] intrinsics; R: [3,3], T: [3] with
    x_cam = R @ x_world + T."""

    K: jax.Array
    R: jax.Array
    T: jax.Array

    @property
    def center(self) -> jax.Array:
        """Camera center in world coordinates: c = -R^T T."""
        return -self.R.T @ self.T

    @staticmethod
    def looking_at(
        eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
        focal: float = 300.0, img_hw: Tuple[int, int] = (256, 256),
    ) -> "Camera":
        """Build a camera at `eye` looking at `target` (OpenCV convention:
        +z forward, +x right, +y down in the camera frame)."""
        eye = jnp.asarray(eye, jnp.float32)
        target = jnp.asarray(target, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        fwd = target - eye
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(fwd, up)
        right = right / jnp.linalg.norm(right)
        down = jnp.cross(fwd, right)
        R = jnp.stack([right, down, fwd], axis=0)  # world->cam rows
        T = -R @ eye
        h, w = img_hw
        K = jnp.array(
            [[focal, 0.0, (w - 1) / 2.0], [0.0, focal, (h - 1) / 2.0], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        return Camera(K=K, R=R, T=T)


def pixel_rays(camera: Camera, img_h: int, img_w: int) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel world-space rays.

    Returns (origins [H*W, 3], dirs [H*W, 3]) with unit-norm dirs. Origin is
    the camera center (shared), broadcast per ray for a uniform tracer API.
    """
    ys = jnp.arange(img_h, dtype=jnp.float32)
    xs = jnp.arange(img_w, dtype=jnp.float32)
    u, v = jnp.meshgrid(xs, ys)  # [H,W] pixel coords (u=x, v=y)
    ones = jnp.ones_like(u)
    pix = jnp.stack([u, v, ones], axis=-1).reshape(-1, 3)  # [N,3]
    Kinv = jnp.linalg.inv(camera.K)
    d_cam = pix @ Kinv.T
    d_world = d_cam @ camera.R  # R^T @ d_cam, batched
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    c = camera.center
    origins = jnp.broadcast_to(c[None, :], d_world.shape)
    return origins, d_world


def ray_sphere_entry(
    origins: jax.Array, dirs: jax.Array, radius: float = 1.0, margin: float = 0.0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Intersect rays with the bounding sphere (shapes are DeepSDF-normalized
    into ~unit sphere — SURVEY.md §3.1 'ray init').

    Returns (t_near, t_far, hit_mask). Rays missing the sphere get
    t_near = t_far = 0 and hit=False (immediately background)."""
    r = radius + margin
    b = jnp.sum(origins * dirs, axis=-1)
    c = jnp.sum(origins * origins, axis=-1) - r * r
    disc = b * b - c
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = jnp.maximum(-b - sq, 0.0)
    t_far = -b + sq
    hit = hit & (t_far > 0.0)
    t_near = jnp.where(hit, t_near, 0.0)
    t_far = jnp.where(hit, t_far, 0.0)
    return t_near, t_far, hit


# ----------------------------------------------------------------------------
# Rotation parameterizations for pose optimization (SURVEY.md §3.5: extrinsics
# become optimization variables via a continuous parameterization).
# ----------------------------------------------------------------------------

def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (Rodrigues) -> rotation matrix; safe at ||w|| -> 0."""
    theta = jnp.linalg.norm(w)
    # Taylor-safe coefficients
    theta2 = theta * theta
    small = theta < 1e-6
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    wx = jnp.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]], w.dtype
    )
    return jnp.eye(3, dtype=w.dtype) + a * wx + b * (wx @ wx)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle (principal branch). Handles both the
    theta -> 0 and theta -> pi singularities (the vee formula loses all
    precision near pi; there the axis is recovered from the symmetric
    part instead)."""
    cos = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    vee = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin = jnp.sin(theta)
    scale = jnp.where(
        theta < 1e-6,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(sin == 0, 1.0, sin)),
    )
    w_gen = scale * vee

    # near pi: R + R^T = 2 cos I + 2 (1 - cos) n n^T  =>  columns of
    # B = (R + R^T)/2 - cos I are (1 - cos) n_i * n; take the largest.
    B = 0.5 * (R + R.T) - cos * jnp.eye(3, dtype=R.dtype)
    col_sq = jnp.sum(B * B, axis=0)
    k = jnp.argmax(col_sq)
    axis = B[:, k]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    # sign: align with vee (vee ~ 2 sin(theta) n keeps the right sign as
    # long as sin(theta) > 0, i.e. theta < pi exactly)
    sign = jnp.where(jnp.dot(axis, vee) < 0.0, -1.0, 1.0)
    w_pi = theta * axis * sign

    return jnp.where(cos < -0.9, w_pi, w_gen)


def rot6d_to_matrix(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation parameterization (Zhou et al. CVPR 2019):
    two 3-vectors -> Gram-Schmidt orthonormal frame."""
    a1, a2 = x[..., :3], x[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rot6d(R: jax.Array) -> jax.Array:
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def camera_from_pose(pose: jax.Array, K: jax.Array, param: str = "so3") -> Camera:
    """Build a Camera from a flat pose vector (the pose-optimization leaf).

    param="so3": pose = [w(3), T(3)];  param="rot6d": pose = [r6(6), T(3)]."""
    if param == "so3":
        R = so3_exp(pose[:3])
        T = pose[3:6]
    elif param == "rot6d":
        R = rot6d_to_matrix(pose[:6])
        T = pose[6:9]
    else:
        raise ValueError(f"unknown pose parameterization: {param}")
    return Camera(K=K, R=R, T=T)


def pose_from_camera(camera: Camera, param: str = "so3") -> jax.Array:
    if param == "so3":
        return jnp.concatenate([so3_log(camera.R), camera.T])
    elif param == "rot6d":
        return jnp.concatenate([matrix_to_rot6d(camera.R), camera.T])
    raise ValueError(f"unknown pose parameterization: {param}")


def project(camera: Camera, points: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """World points -> pixel coordinates (u, v) and camera-frame depth z.
    Used by the multi-view photometric warping loss (SURVEY.md §3.4)."""
    pc = points @ camera.R.T + camera.T
    z = pc[..., 2]
    uvw = pc @ camera.K.T
    uv = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-8)
    return uv, z
