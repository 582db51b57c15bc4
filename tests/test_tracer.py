"""Tracer correctness vs analytic oracles (SURVEY.md §4 'Unit'):
closed-form sphere depths to ~1e-4, normals, silhouette margins, misses,
aggressive-march overshoot safety on composite shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import MarchConfig, RenderConfig, GradConfig
from dist_renderer_tpu.models.analytic import (
    analytic_sphere_depth,
    box_sdf,
    latent_sphere_sdf,
    round_union,
    sphere_sdf,
    torus_sdf,
)
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render, render_rays
from dist_renderer_tpu.ops.tracer import sphere_trace

MARCH = MarchConfig(max_steps=64, convergence_eps=1e-5)
Z0 = jnp.zeros((1,))


def _camera(img=32, dist=2.0, focal=40.0):
    return Camera.looking_at((0.0, 0.0, -dist), focal=focal, img_hw=(img, img))


def test_sphere_depth_matches_closed_form():
    cam = _camera()
    o, v = pixel_rays(cam, 32, 32)
    f = sphere_sdf(0.5)
    res = sphere_trace(lambda p: f(None, p), o, v, MARCH)
    gt = analytic_sphere_depth(o, v, 0.5)
    hit_gt = np.asarray(gt) > 0
    hit = np.asarray(res.hit)
    assert (hit == hit_gt).mean() > 0.99  # rim pixels may differ
    err = np.abs(np.asarray(res.depth) - np.asarray(gt))[hit & hit_gt]
    assert err.max() < 1e-3
    assert err.mean() < 1e-4


def test_miss_rays_background_and_margin():
    cam = _camera()
    o, v = pixel_rays(cam, 32, 32)
    f = sphere_sdf(0.3)
    res = sphere_trace(lambda p: f(None, p), o, v, MARCH)
    miss = ~np.asarray(res.hit)
    # missed rays carry a positive min-SDF margin
    assert (np.asarray(res.min_sdf)[miss] > 0).all()
    # hit rays carry a non-positive margin (overshoot can record sdf < 0)
    assert (np.asarray(res.min_sdf)[np.asarray(res.hit)] < 1e-4).all()


@pytest.mark.parametrize("shape", ["box", "torus", "union"])
def test_composite_shapes_converge(shape):
    f = {
        "box": box_sdf((0.4, 0.3, 0.2)),
        "torus": torus_sdf(0.4, 0.15),
        "union": round_union(sphere_sdf(0.35, (0.2, 0, 0)), sphere_sdf(0.35, (-0.2, 0, 0))),
    }[shape]
    cam = _camera()
    o, v = pixel_rays(cam, 32, 32)
    res = sphere_trace(lambda p: f(None, p), o, v, MARCH)
    hit = np.asarray(res.hit)
    assert hit.sum() > 50  # shape visible
    # converged rays really are on the surface
    p = np.asarray(o + res.depth[:, None] * v)[hit]
    s = np.asarray(f(None, jnp.asarray(p)))
    assert np.abs(s).max() < 1e-4


def test_aggressive_faster_than_conservative():
    cam = _camera()
    o, v = pixel_rays(cam, 32, 32)
    f = sphere_sdf(0.5)
    fast = sphere_trace(lambda p: f(None, p), o, v, MARCH)
    slow = sphere_trace(
        lambda p: f(None, p), o, v,
        MarchConfig(max_steps=64, convergence_eps=1e-5, alpha=1.0),
    )
    # same geometry ...
    both = np.asarray(fast.hit) & np.asarray(slow.hit)
    np.testing.assert_allclose(
        np.asarray(fast.depth)[both], np.asarray(slow.depth)[both], atol=1e-3
    )
    # ... fewer steps with aggressive marching
    assert int(fast.steps_used) < int(slow.steps_used)


def test_live_count_telemetry_shrinks():
    cam = _camera()
    o, v = pixel_rays(cam, 32, 32)
    f = sphere_sdf(0.5)
    res = sphere_trace(lambda p: f(None, p), o, v, MARCH)
    counts = np.asarray(res.live_counts)
    used = int(res.steps_used)
    assert counts[0] > 0
    assert counts[used - 1] <= counts[0]


def test_render_full_frame_maps():
    cfg = RenderConfig(img_h=32, img_w=32, march=MARCH)
    cam = _camera()
    f = latent_sphere_sdf()
    z = jnp.array([0.5])
    out = render(f, z, cam, cfg)
    assert out.depth.shape == (32, 32)
    assert out.normal.shape == (32, 32, 3)
    assert out.mask.shape == (32, 32)
    mask = np.asarray(out.mask)
    assert mask.any() and not mask.all()
    # normals on a sphere point radially: n == p / ||p||
    pts = np.asarray(out.points)[mask]
    n_gt = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    n = np.asarray(out.normal)[mask]
    np.testing.assert_allclose(n, n_gt, atol=1e-3)
    # background sentinel where missed
    assert (np.asarray(out.depth)[~mask] == cfg.background_depth).all()
