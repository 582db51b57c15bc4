"""Native (C++) mesh kernels vs numpy reference parity + speed sanity."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from dist_renderer_tpu.eval.mesh import marching_tetrahedra, sdf_grid
from dist_renderer_tpu.eval.native import (
    load_library,
    marching_tetrahedra_native,
    sample_mesh_surface_native,
)
from dist_renderer_tpu.models.analytic import sphere_sdf, torus_sdf

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable (no g++)"
)


def _grid(shape_fn, r=32):
    f = lambda p: shape_fn(None, p)
    return sdf_grid(f, r)


def test_native_mt_matches_numpy_geometry():
    grid = _grid(sphere_sdf(0.5))
    nv, nf = marching_tetrahedra_native(grid)
    pv, pf = marching_tetrahedra(grid)
    # same surface: both vertex sets lie on the r=0.5 sphere
    for verts in (nv, pv):
        rr = np.linalg.norm(verts, axis=1)
        assert np.abs(rr - 0.5).max() < 0.05
    # triangle counts in the same ballpark (dedup details differ slightly)
    assert abs(len(nf) - len(pf)) < 0.05 * max(len(nf), len(pf)) + 10
    assert nf.max() < len(nv)


def test_native_mt_torus_and_sampling():
    grid = _grid(torus_sdf(0.4, 0.15), r=40)
    nv, nf = marching_tetrahedra_native(grid)
    assert len(nf) > 500
    pts = sample_mesh_surface_native(nv, nf, 2000, seed=7)
    assert pts.shape == (2000, 3)
    f = torus_sdf(0.4, 0.15)
    s = np.asarray(f(None, jnp.asarray(pts)))
    assert np.abs(s).max() < 0.06


def test_native_faster_than_numpy():
    grid = _grid(sphere_sdf(0.6), r=48)
    t0 = time.perf_counter()
    marching_tetrahedra_native(grid)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    marching_tetrahedra(grid)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy  # typically 10-100x
