"""Mesh raycasting: OBJ IO + depth-map rendering of triangle meshes.

Reference analog: the reference's depth-completion observations come from
OFFLINE depth renders of ShapeNet meshes produced by its preprocessing
scripts (SURVEY.md §2 'Preprocessing tools' — external renderers there).
This module is the rebuild's own mesh renderer for that step: a C++ BVH
raycaster (native/mesh_kernels.cpp, ctypes) with a chunked numpy
Moller-Trumbore fallback, plus the camera plumbing to produce
depth/mask/normal maps in exactly the frame the sphere tracer uses — so
mesh renders and SDF renders are directly comparable.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from dist_renderer_tpu.ops.camera import Camera


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: v/f records, polygon faces fan-triangulated.
    Inverse of eval.mesh.save_obj; handles the `f v/vt/vn` index forms."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) for p in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int64).reshape(-1, 3),
    )


def raycast_depth_numpy(
    verts: np.ndarray, faces: np.ndarray,
    origins: np.ndarray, dirs: np.ndarray,
    tri_chunk: int = 2048,
) -> np.ndarray:
    """Brute-force Moller-Trumbore over triangle chunks (fallback path).
    Returns hit distances [N], inf where miss."""
    a = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - a
    e2 = verts[faces[:, 2]] - a
    best = np.full((len(origins),), np.inf, np.float32)
    for s in range(0, len(faces), tri_chunk):
        aa, u, w = a[s:s + tri_chunk], e1[s:s + tri_chunk], e2[s:s + tri_chunk]
        p = np.cross(dirs[:, None, :], w[None, :, :])        # [N,T,3]
        det = np.einsum("tj,ntj->nt", u, p)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, np.inf, det)
        sv = origins[:, None, :] - aa[None, :, :]
        uu = np.einsum("ntj,ntj->nt", sv, p) * inv
        q = np.cross(sv, u[None, :, :])
        vv = np.einsum("nj,ntj->nt", dirs, q) * inv
        t = np.einsum("tj,ntj->nt", w, q) * inv
        ok = (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1) & (t > 1e-6)
        t = np.where(ok, t, np.inf).min(axis=1)
        best = np.minimum(best, t.astype(np.float32))
    return best


def raycast_depth(
    verts: np.ndarray, faces: np.ndarray,
    origins: np.ndarray, dirs: np.ndarray,
    use_native: bool = True,
) -> np.ndarray:
    """Hit distances [N] (inf = miss): C++ BVH when available, numpy else."""
    if use_native:
        from dist_renderer_tpu.eval.native import raycast_depth_native

        out = raycast_depth_native(verts, faces, origins, dirs)
        if out is not None:
            return out
    return raycast_depth_numpy(verts, faces, origins, dirs)


def render_mesh_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    camera: Camera,
    img_hw: Tuple[int, int],
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Depth + mask maps of a mesh under the tracer's camera model.

    The returned depth is the RAY-LENGTH map (distance along the pixel
    ray), matching what render()/sphere_trace produce — the two are
    directly comparable per pixel."""
    from dist_renderer_tpu.ops.camera import pixel_rays

    h, w = img_hw
    origins, dirs = pixel_rays(camera, h, w)
    t = raycast_depth(
        verts, faces, np.asarray(origins), np.asarray(dirs), use_native
    )
    mask = np.isfinite(t)
    depth = np.where(mask, t, 0.0).astype(np.float32)
    return depth.reshape(h, w), mask.reshape(h, w)


def deepsdf_normalization(
    verts: np.ndarray, buffer: float = 1.03
) -> Tuple[np.ndarray, float]:
    """DeepSDF-style unit-sphere normalization: offset = bbox center,
    scale maps the farthest vertex to radius 1/buffer. Normalized
    vertices = (v - offset) * scale — matches the convention
    data.datasets.ShapeNetDepthDataset applies when bringing observations
    into decoder coordinates (depth *= scale, T' = (T + R @ offset) * scale).
    """
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    offset = ((lo + hi) / 2.0).astype(np.float32)
    radius = float(np.linalg.norm(verts - offset, axis=1).max())
    scale = 1.0 / (buffer * max(radius, 1e-12))
    return offset, scale
