"""Eval + viz unit tests: chamfer vs closed forms, marching tetrahedra on
analytic SDFs, loss-library behavior, image encodings."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.eval.chamfer import (
    chamfer_distance, chamfer_vs_analytic, sample_surface_points,
)
from dist_renderer_tpu.eval.mesh import (
    extract_mesh, marching_tetrahedra, sample_mesh_surface, save_obj, sdf_grid,
)
from dist_renderer_tpu.models.analytic import sphere_sdf, torus_sdf
from dist_renderer_tpu.utils import losses as L
from dist_renderer_tpu.utils.viz import (
    colorize_depth, colorize_normal, colorize_silhouette, panel,
)


def test_chamfer_identical_is_zero():
    pts = jax.random.normal(jax.random.PRNGKey(0), (500, 3))
    a2b, b2a, total = chamfer_distance(pts, pts)
    assert float(total) < 1e-9


def test_chamfer_offset_spheres():
    """Two spheres of radius 1 offset by delta: one-sided chamfer ~ delta^2
    scale; sanity only (exact value depends on geometry)."""
    key = jax.random.PRNGKey(1)
    p = jax.random.normal(key, (2000, 3))
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    q = p + jnp.array([0.1, 0.0, 0.0])
    _, _, total = chamfer_distance(p, q)
    assert 0.0 < float(total) < 2 * 0.1**2 + 1e-3


def test_surface_sampling_lands_on_surface():
    f = lambda p: sphere_sdf(0.5)(None, p)
    pts = sample_surface_points(f, n=512, key=jax.random.PRNGKey(0))
    r = np.linalg.norm(np.asarray(pts), axis=1)
    assert np.abs(r - 0.5).max() < 5e-3


def test_chamfer_vs_analytic_same_shape_small():
    f = lambda p: sphere_sdf(0.5)(None, p)
    d = chamfer_vs_analytic(f, f, n=1000)
    # squared chamfer between two 1k-point samplings of the same sphere is
    # bounded by the sampling density (~spacing^2 ~ 1e-3), not zero
    assert d < 5e-3


def test_marching_tetrahedra_sphere():
    f = lambda p: sphere_sdf(0.5)(None, p)
    verts, faces = extract_mesh(f, resolution=32)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    # vertices lie near the sphere surface (grid resolution limited)
    assert np.abs(r - 0.5).max() < 0.05
    # faces index valid vertices
    assert faces.max() < len(verts)


def test_mesh_surface_sampling_and_obj(tmp_path):
    f = lambda p: torus_sdf(0.4, 0.15)(None, p)
    verts, faces = extract_mesh(f, resolution=24)
    pts = sample_mesh_surface(verts, faces, 1000)
    s = np.asarray(f(jnp.asarray(pts)))
    assert np.abs(s).max() < 0.06
    path = str(tmp_path / "t.obj")
    save_obj(path, verts, faces)
    assert os.path.getsize(path) > 0


def test_losses_basic():
    d = jnp.ones((4, 4))
    t = jnp.zeros((4, 4))
    m = jnp.ones((4, 4), bool)
    assert float(L.masked_l1(d, t, m)) == 1.0
    # empty mask is safe
    assert float(L.masked_l1(d, t, jnp.zeros((4, 4), bool))) == 0.0
    # silhouette: positive margin inside mask is penalized
    ms = jnp.full((4,), 0.2)
    assert float(L.silhouette_loss(ms, jnp.ones((4,), bool))) > 0
    assert float(L.silhouette_loss(ms, jnp.zeros((4,), bool))) == 0.0


def test_bilinear_sample_matches_corners():
    img = jnp.arange(16.0).reshape(4, 4, 1)
    uv = jnp.array([[0.0, 0.0], [3.0 - 1e-4, 0.0], [0.0, 3.0 - 1e-4]])
    out = np.asarray(L.bilinear_sample(img, uv))[:, 0]
    np.testing.assert_allclose(out, [0.0, 3.0, 12.0], atol=1e-2)


def test_viz_encodings():
    depth = np.random.rand(8, 8).astype(np.float32) + 1.0
    mask = depth > 1.5
    rgb = colorize_depth(depth, mask)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    assert (rgb[~mask] == 0).all()
    n = np.zeros((8, 8, 3), np.float32)
    n[..., 2] = 1.0
    rn = colorize_normal(n)
    assert (rn[..., 2] == 255).all()
    sil = colorize_silhouette(np.full((8, 8), -1.0))
    assert (sil > 250).all()
    p = panel([rgb, rn])
    assert p.shape[1] > 16
