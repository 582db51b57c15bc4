"""Gradient correctness of the last-step / IFT backward (SURVEY.md §4
'gradient checks of the custom_vjp vs finite differences on tiny images'
and §7 hard part 3: pose gradients through ray origins/directions)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_renderer_tpu.config import GradConfig, MarchConfig, RenderConfig
from dist_renderer_tpu.models.analytic import latent_sphere_sdf
from dist_renderer_tpu.ops.camera import Camera, pixel_rays
from dist_renderer_tpu.ops.renderer import render_rays

MARCH = MarchConfig(max_steps=64, convergence_eps=1e-6)


def _center_ray(dist=2.0):
    o = jnp.array([[0.0, 0.0, -dist]])
    v = jnp.array([[0.0, 0.0, 1.0]])
    return o, v


@pytest.mark.parametrize("mode", ["last_step", "ift"])
def test_depth_grad_wrt_latent_sphere(mode):
    """Centered sphere of radius r: depth along a center ray = dist - r,
    so d(depth)/dr = -1 exactly."""
    cfg = RenderConfig(img_h=1, img_w=1, march=MARCH, grad=GradConfig(mode=mode))
    o, v = _center_ray()
    f = latent_sphere_sdf()

    def depth_of(r):
        out = render_rays(f, jnp.array([r]), o, v, cfg)
        return out.depth[0]

    g = jax.grad(depth_of)(0.5)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), -1.0, atol=1e-3)


@pytest.mark.parametrize("mode", ["last_step", "ift"])
def test_depth_grad_wrt_origin(mode):
    """Moving the origin toward the sphere reduces depth 1:1 along the ray
    => d(depth)/d(o_z) = -1 for a +z ray. Exercises pose gradients through
    ray origins (SURVEY.md §3.5)."""
    cfg = RenderConfig(img_h=1, img_w=1, march=MARCH, grad=GradConfig(mode=mode))
    f = latent_sphere_sdf()
    z = jnp.array([0.5])

    def depth_of(oz):
        o = jnp.array([[0.0, 0.0, oz]])
        v = jnp.array([[0.0, 0.0, 1.0]])
        return render_rays(f, z, o, v, cfg).depth[0]

    g = jax.grad(depth_of)(-2.0)
    np.testing.assert_allclose(float(g), -1.0, atol=1e-3)


def test_grad_matches_finite_difference_offaxis():
    """Off-axis ray: grazing-ish geometry; IFT mode must match FD of the
    true hit distance w.r.t. radius: depth(r) has d(depth)/dr =
    -1/(n·(-v))... checked numerically via the tracer itself."""
    cfg = RenderConfig(img_h=1, img_w=1, march=MARCH, grad=GradConfig(mode="ift"))
    o = jnp.array([[0.3, 0.2, -2.0]])
    v = jnp.array([[0.0, 0.0, 1.0]])
    f = latent_sphere_sdf()

    def depth_of(r):
        return render_rays(f, jnp.array([r]), o, v, cfg).depth[0]

    g = jax.grad(depth_of)(0.6)
    eps = 1e-4
    fd = (depth_of(0.6 + eps) - depth_of(0.6 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_min_sdf_grad_for_missing_ray():
    """A ray that misses: d(min_sdf)/dr = -1 (closest distance to a sphere
    of radius r shrinks as r grows). This is the silhouette gradient that
    pulls shapes to cover the mask."""
    cfg = RenderConfig(img_h=1, img_w=1, march=MARCH)
    o = jnp.array([[0.8, 0.0, -2.0]])  # passes 0.8 to the side
    v = jnp.array([[0.0, 0.0, 1.0]])
    f = latent_sphere_sdf()

    def margin_of(r):
        return render_rays(f, jnp.array([r]), o, v, cfg).min_sdf[0]

    m = margin_of(0.5)
    assert float(m) > 0
    g = jax.grad(margin_of)(0.5)
    np.testing.assert_allclose(float(g), -1.0, atol=1e-2)


def test_memory_flat_grad_is_finite_through_jit():
    """grad(jit(render)) must work — no differentiation through while_loop."""
    cfg = RenderConfig(img_h=4, img_w=4, march=MARCH)
    cam = Camera.looking_at((0.0, 0.0, -2.0), focal=5.0, img_hw=(4, 4))
    o, v = pixel_rays(cam, 4, 4)
    f = latent_sphere_sdf()

    @jax.jit
    def loss(r):
        out = render_rays(f, jnp.array([r]), o, v, cfg)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0))

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g))
